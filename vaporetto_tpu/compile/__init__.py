from .merger import PositionalWeight, PositionalWeightWithTag, WeightMerger
from .compiler import CompiledModel, compile_model

__all__ = [
    "PositionalWeight",
    "PositionalWeightWithTag",
    "WeightMerger",
    "CompiledModel",
    "compile_model",
]
