from .model import (
    Model,
    NgramData,
    TagWeight,
    TagNgramData,
    TagModel,
    WordWeightRecord,
)

__all__ = [
    "Model",
    "NgramData",
    "TagWeight",
    "TagNgramData",
    "TagModel",
    "WordWeightRecord",
]
