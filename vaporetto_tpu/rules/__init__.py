from .string_filters import KyteaFullwidthFilter
from .sentence_filters import (
    ConcatGraphemeClustersFilter,
    KyteaWsConstFilter,
    PatternMatchTagger,
    SplitLinebreaksFilter,
)

__all__ = [
    "KyteaFullwidthFilter",
    "ConcatGraphemeClustersFilter",
    "KyteaWsConstFilter",
    "PatternMatchTagger",
    "SplitLinebreaksFilter",
]
