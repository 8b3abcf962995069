"""Config-matrix tests (SURVEY.md §4 implication (c)).

The reference CI runs its test suite once per feature flag in isolation
(cache-type-score, tag-prediction, ...); our analogue: every runtime
variant combination must produce identical results.
"""

import numpy as np
import pytest

from vaporetto_tpu.compile.compiler import compile_model
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence

from test_scorers import create_test_model


def scores_with(compiled):
    pred = Predictor.__new__(Predictor)
    pred.compiled = compiled
    pred.predict_tags_enabled = False
    pred._store_tag_scores = False
    pred._device_tables = None
    pred._jit_cache = {}
    texts = ["この人は地球人だ", "人だ地球", "地球地球人人"]
    out = []
    for t in texts:
        s = Sentence.from_raw(t)
        pred.predict_batch([s])
        out.append(s.boundary_scores_list())
    return out


class TestConfigMatrix:
    def test_type_cache_vs_trie_identical(self):
        model = create_test_model()
        cache = compile_model(model, False)
        trie = compile_model(model, False, prefer_type_trie=True)
        assert cache.type_cache_table is not None
        assert trie.type_matcher is not None and trie.type_cache_table is None
        assert scores_with(cache) == scores_with(trie)

    def test_tags_on_off_same_boundaries(self):
        model_a = create_test_model()
        model_b = create_test_model()
        pred_off = Predictor(model_a, False)
        pred_on = Predictor(model_b, True)
        for t in ["この人は地球人だ", "地球人だ"]:
            s1 = Sentence.from_raw(t)
            s2 = Sentence.from_raw(t)
            pred_off.predict(s1)
            pred_on.predict(s2)
            assert s1.boundary_scores_list() == s2.boundary_scores_list()
            assert np.array_equal(s1.boundaries, s2.boundaries)

    def test_batch_sizes_identical(self):
        pred = Predictor(create_test_model(), False)
        texts = ["この人は地球人だ"] * 5
        singles = []
        for t in texts:
            s = Sentence.from_raw(t)
            pred.predict(s)
            singles.append(s.boundary_scores_list())
        batch = [Sentence.from_raw(t) for t in texts]
        pred.predict_batch(batch)
        assert [s.boundary_scores_list() for s in batch] == singles


def test_type_split_tables_match_cache(monkeypatch):
    """VAPORETTO_TPU_TYPE_SPLIT=1 (opt-in experiment) must produce the
    exact conformance outputs: the left/mid/right decomposition is
    numerically identical to the cache table (see also the direct
    table-equivalence check below)."""
    import numpy as np

    from vaporetto_tpu.models.model import Model
    from vaporetto_tpu.predictor import Predictor
    from vaporetto_tpu.sentence import Sentence

    monkeypatch.setenv("VAPORETTO_TPU_TYPE_SPLIT", "1")
    pred = Predictor(Model.read("/root/reference/resources/model.bin"))
    assert "type_split" in pred._tables()
    s = Sentence.from_raw("まぁ社長は火星猫だ")
    pred.predict(s)
    assert s.write_tokenized_text() == "まぁ 社長 は 火星 猫 だ"

    c = pred.compiled
    tl, tm, tr = c.type_split_tables
    w, maxn = c.type_window_size, c.type_split_maxn
    cache = c.type_cache_table
    n = len(cache)
    ids = np.arange(n, dtype=np.int64)
    seq = 2 * w
    syms = [(ids >> (3 * (seq - 1 - k))) & 7 for k in range(seq)]
    valid = np.ones(n, bool)
    for k in range(seq):
        valid &= syms[k] != 7

    def code(poss):
        c2 = np.zeros(n, np.int64)
        for x in poss:
            c2 = (c2 << 3) | syms[x]
        return c2

    recon = (
        tl[code(range(0, w))]
        + tm[code(range(w - maxn + 1, w + maxn - 1))]
        + tr[code(range(w, 2 * w))]
    )
    assert (recon[valid] == cache[valid]).all()
