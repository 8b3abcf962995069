"""Exact-hash matcher (ops/hashmatch.py) vs the windowed trie walk.

The hash matcher must reproduce match_longest_fused's answers exactly —
the Aho-Corasick ``no_suffix`` longest-match stream (reference
char_scorer/boundary_scorer.rs:91-113) — on every input, since the
scoring and tag paths consume the ids unchanged.
"""

import numpy as np
import pytest

from vaporetto_tpu.compile.trie import build_trie
from vaporetto_tpu.models.model import Model, WordWeightRecord
from vaporetto_tpu.ops import hashmatch
from vaporetto_tpu.predictor import Predictor

from test_scorers import create_test_model


def _rand_patterns(rng, n, n_symbols, max_len):
    pats = set()
    while len(pats) < n:
        k = int(rng.integers(1, max_len + 1))
        pats.add(tuple(int(x) for x in rng.integers(1, n_symbols + 1, k)))
    return sorted(pats)


class _FakeMatcher:
    def __init__(self, trie):
        self.base = trie.base
        self.check = trie.check
        self.value = trie.value
        self.inherit = trie.inherit
        self.max_len = trie.max_len


def _walk_answer(syms, trie):
    """Reference answers via the fused walk (tested in test_match_ops)."""
    import jax.numpy as jnp

    from vaporetto_tpu.ops.match import build_walk_tab, match_longest_fused

    walk_tab, dead, root_base = build_walk_tab(
        trie.base, trie.check, trie.inherit
    )
    return np.asarray(match_longest_fused(
        jnp.asarray(syms), jnp.asarray(walk_tab), trie.max_len,
        dead, root_base,
    ))


class TestExtraction:
    def test_round_trip(self):
        rng = np.random.default_rng(7)
        pats = _rand_patterns(rng, 200, 30, 7)
        trie = build_trie(pats, 30)
        syms, lengths, pids = hashmatch.extract_patterns(
            _FakeMatcher(trie)
        )
        # column e = symbol at distance e from the END; reverse to get
        # the first-to-last pattern tuple
        got = {}
        for i in range(len(pids)):
            k = int(lengths[i])
            pat = tuple(int(syms[i, e]) for e in range(k))[::-1]
            got[pat] = int(pids[i])
        assert got == {tuple(p): i for i, p in enumerate(pats)}


class TestEquivalence:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_models(self, seed):
        rng = np.random.default_rng(seed)
        n_symbols = int(rng.integers(5, 60))
        pats = _rand_patterns(
            rng, int(rng.integers(5, 300)), n_symbols,
            int(rng.integers(2, 9)),
        )
        trie = build_trie(pats, n_symbols)
        hm = hashmatch.build_hash_match_tables(_FakeMatcher(trie))
        assert hm is not None
        import jax.numpy as jnp

        # streams mixing in-vocabulary runs with OOV zeros
        syms = rng.integers(0, n_symbols + 1, size=(4, 64)).astype(np.int32)
        want = _walk_answer(syms, trie)
        got = np.asarray(hashmatch.hash_match_longest(
            jnp.asarray(syms), jnp.asarray(hm.d), jnp.asarray(hm.l2), hm
        ))
        assert np.array_equal(got, want)

    def test_dense_pattern_text(self):
        """Text consisting entirely of patterns (every position matches)."""
        rng = np.random.default_rng(3)
        pats = _rand_patterns(rng, 50, 8, 5)
        trie = build_trie(pats, 8)
        hm = hashmatch.build_hash_match_tables(_FakeMatcher(trie))
        import jax.numpy as jnp

        stream = []
        while len(stream) < 200:
            stream.extend(pats[int(rng.integers(0, len(pats)))])
        syms = np.asarray(stream[:200], dtype=np.int32)[None, :]
        want = _walk_answer(syms, trie)
        got = np.asarray(hashmatch.hash_match_longest(
            jnp.asarray(syms), jnp.asarray(hm.d), jnp.asarray(hm.l2), hm
        ))
        assert np.array_equal(got, want)

    def test_long_patterns_fall_back(self):
        pats = [tuple(range(1, 20))]  # length 19 > HASH_MATCH_MAX_LEN
        trie = build_trie(pats, 20)
        assert hashmatch.build_hash_match_tables(_FakeMatcher(trie)) is None


class TestEndToEnd:
    """Full predictor outputs with the hash matcher vs the walk."""

    def _scores(self, model, texts, disable):
        import os

        from vaporetto_tpu.sentence import Sentence

        if disable:
            os.environ["VAPORETTO_TPU_NO_HASHMATCH"] = "1"
        else:
            os.environ.pop("VAPORETTO_TPU_NO_HASHMATCH", None)
        try:
            pred = Predictor(model)
            # drop any cached build so the env var is honored
            for m in (pred.compiled.char_matcher,
                      pred.compiled.type_matcher):
                if m is not None and hasattr(m, "_hash_match_cache"):
                    del m._hash_match_cache
            pred._device_tables = None
            sents = [Sentence.from_raw(t) for t in texts]
            pred.predict_batch(sents)
            return [list(s.boundary_scores_list()) for s in sents]
        finally:
            os.environ.pop("VAPORETTO_TPU_NO_HASHMATCH", None)

    def test_golden_model(self):
        texts = ["この人は地球人だ", "人だ人だ", "地球", "人", "だ"]
        model = create_test_model()
        assert self._scores(model, texts, False) == \
            self._scores(model, texts, True)

    def test_bundled_model_docs(self):
        from conftest import docs_tok_raws

        model = Model.read("/root/reference/resources/model.bin")
        texts = docs_tok_raws()
        assert self._scores(model, texts, False) == \
            self._scores(model, texts, True)

    def test_long_word_model_falls_back_to_walk(self):
        """A dictionary word beyond HASH_MATCH_MAX_LEN must disable the
        hash matcher for that side (walk fallback) and still score
        correctly end to end."""
        base = Model.read("/root/reference/resources/model.bin")
        long_word = "火星猫" * 7  # 21 chars > 16
        base.replace_dictionary([
            WordWeightRecord(long_word, [5] * (len(long_word) + 1), ""),
            WordWeightRecord("火星", [0, -7, 0], ""),
        ])
        from vaporetto_tpu.predictor import Predictor as P

        pred = P(base)
        assert hashmatch.hash_match_for(
            pred.compiled.char_matcher
        ) is None
        texts = [long_word, "火星" + long_word, "猫だ火星猫"]
        a = self._scores(base, texts, False)
        b = self._scores(base, texts, True)
        assert a == b

    def test_dictionary_model(self):
        """A dictionary with words up to 7 chars exercises multi-length
        hash regions + verification (the big-model shape, scaled down)."""
        rng = np.random.default_rng(11)
        chars = [chr(c) for c in range(0x4E00, 0x4E80)]
        words = sorted({
            "".join(rng.choice(chars)
                    for _ in range(int(rng.integers(2, 8))))
            for _ in range(300)
        })
        base = Model.read("/root/reference/resources/model.bin")
        records = [
            WordWeightRecord(
                w, [int(rng.integers(-500, 500))] * (len(w) + 1), ""
            )
            for w in words
        ]
        base.replace_dictionary(records)  # in-place (model.rs:155-168)
        model = base
        lines = [
            "".join(rng.choice(words)
                    for _ in range(int(rng.integers(1, 6))))
            for _ in range(8)
        ]
        assert self._scores(model, lines, False) == \
            self._scores(model, lines, True)
