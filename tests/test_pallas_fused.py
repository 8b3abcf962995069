"""Interpret-mode equivalence of the fused Pallas kernel.

The fused kernel (ops/pallas_fused.py) must reproduce the XLA pipeline's
padded scores and match tensors exactly (int32, same padding scheme —
reference semantics pinned by tests/test_scorers.py). PERF.md records why
it is not the production path on current Mosaic (gather lowering limits);
this test keeps the claimed correctness backed.
"""

import numpy as np
import pytest

from vaporetto_tpu.models.model import Model
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import char_types_of_codepoints

from test_scorers import create_test_model


def _compare(pred, cps, cts, lengths, tile_b=8):
    from vaporetto_tpu.ops.pallas_fused import build_fused_fn

    B, L = cps.shape
    fused = build_fused_fn(pred.compiled, B, L, interpret=True,
                           tile_b=tile_b)
    assert fused is not None, "tables exceed VMEM budget unexpectedly"
    ref_fn = pred.predict_raw_fn()
    want_scores, want_cm, want_tm = ref_fn(cps, cts, lengths)
    got_scores, got_cm, got_tm = fused(cps, cts, lengths)
    np.testing.assert_array_equal(
        np.asarray(got_scores), np.asarray(want_scores)
    )
    if want_cm is not None:
        np.testing.assert_array_equal(np.asarray(got_cm),
                                      np.asarray(want_cm))
    if want_tm is not None:
        np.testing.assert_array_equal(np.asarray(got_tm),
                                      np.asarray(want_tm))


def _random_batch(B, L, seed=0):
    rng = np.random.default_rng(seed)
    pools = np.concatenate([
        np.arange(0x3041, 0x3097), np.arange(0x30A1, 0x30FB),
        np.arange(0x4E00, 0x4F00), np.arange(0x30, 0x3A),
        np.arange(0x41, 0x5B),
    ])
    cps = pools[rng.integers(0, len(pools), (B, L))].astype(np.int32)
    cts = char_types_of_codepoints(cps).astype(np.int32)
    lengths = rng.integers(1, L + 1, B).astype(np.int32)
    t = np.arange(L)[None, :]
    cps = np.where(t < lengths[:, None], cps, 0)
    cts = np.where(t < lengths[:, None], cts, 0)
    return cps, cts, lengths


class TestFusedInterpretEquivalence:
    def test_golden_model(self):
        pred = Predictor(create_test_model())
        cps, cts, lengths = _random_batch(8, 16, seed=1)
        # include the golden sentence itself
        s = "この人は地球人だ"
        cps[0, :] = 0
        cps[0, : len(s)] = [ord(c) for c in s]
        cts[0] = char_types_of_codepoints(cps[0])
        lengths[0] = len(s)
        _compare(pred, cps, cts, lengths)

    def test_bundled_reference_model(self):
        pred = Predictor(Model.read("/root/reference/resources/model.bin"))
        cps, cts, lengths = _random_batch(16, 24, seed=2)
        _compare(pred, cps, cts, lengths)

    def test_tile_not_dividing_batch(self):
        pred = Predictor(create_test_model())
        cps, cts, lengths = _random_batch(6, 12, seed=3)
        _compare(pred, cps, cts, lengths, tile_b=4)  # falls back to 1
