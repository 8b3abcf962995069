"""vaporetto_tpu — a TPU-native pointwise-prediction tokenizer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Vaporetto tokenizer (word segmentation + POS/pronunciation
tagging via linear models over char/type n-gram and dictionary features).

The compute path is dense and batched: pattern matching runs as a
halo-chunked automaton scan over ``(B, L)`` codepoint tensors, and boundary
scoring is a gather + windowed accumulation, all in int32 on device.
"""

from .errors import (
    VaporettoError,
    InvalidModelError,
    InvalidArgumentError,
)
from .sentence import (
    CharacterBoundary,
    CharacterType,
    Sentence,
    Token,
)

__version__ = "0.1.0"

__all__ = [
    "VaporettoError",
    "InvalidModelError",
    "InvalidArgumentError",
    "CharacterBoundary",
    "CharacterType",
    "Sentence",
    "Token",
    "Model",
    "Predictor",
    "__version__",
]


def __getattr__(name):
    # lazy imports keep `import vaporetto_tpu` light (no jax import cost
    # until the predictor/ops layers are actually used)
    if name == "Model":
        from .models.model import Model

        return Model
    if name == "WordWeightRecord":
        from .models.model import WordWeightRecord

        return WordWeightRecord
    if name == "Predictor":
        from .predictor import Predictor

        return Predictor
    if name == "Trainer":
        from .train.trainer import Trainer

        return Trainer
    if name == "SolverType":
        from .train.trainer import SolverType

        return SolverType
    if name == "KyteaModel":
        from .models.kytea import KyteaModel

        return KyteaModel
    if name == "VaporettoAnalyzer":
        from .analyzer import VaporettoAnalyzer

        return VaporettoAnalyzer
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
