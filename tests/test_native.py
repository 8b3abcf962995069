"""Native C++ component tests: equivalence with the Python fallbacks."""

import numpy as np
import pytest

from vaporetto_tpu.compile.trie import DoubleArrayTrie, _build_trie_python
from vaporetto_tpu.native import available, build_trie_native, tensorize_native
from vaporetto_tpu.sentence import Sentence

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable"
)


def lookup_all(trie, patterns, extra):
    return [trie.lookup(p) for p in list(patterns) + list(extra)]


class TestNativeTrie:
    def test_equivalence_random(self):
        rng = np.random.default_rng(0)
        n_symbols = 50
        patterns = set()
        while len(patterns) < 500:
            ln = int(rng.integers(1, 9))
            patterns.add(tuple(int(x) for x in rng.integers(1, n_symbols + 1, ln)))
        patterns = sorted(patterns)
        base, check, value, inherit = build_trie_native(patterns, n_symbols)
        native = DoubleArrayTrie(base, check, value, n_symbols, 8, inherit)
        python = _build_trie_python(patterns, n_symbols)
        non_patterns = [
            tuple(int(x) for x in rng.integers(1, n_symbols + 1, 4))
            for _ in range(200)
        ]
        assert lookup_all(native, patterns, non_patterns) == lookup_all(
            python, patterns, non_patterns
        )
        # inherit (AC output link) equivalence, aligned via slot walks
        for p in patterns:
            sn = 0
            sp = 0
            for a in p:
                sn = int(native.base[sn]) + a
                sp = int(python.base[sp]) + a
            assert native.inherit[sn] == python.inherit[sp], p
        # every pattern maps to its own id
        for i, p in enumerate(patterns):
            assert native.lookup(p) == i

    def test_large(self):
        rng = np.random.default_rng(1)
        n_symbols = 3000
        patterns = set()
        while len(patterns) < 20000:
            ln = int(rng.integers(1, 6))
            patterns.add(tuple(int(x) for x in rng.integers(1, n_symbols + 1, ln)))
        patterns = sorted(patterns)
        base, check, value, inherit = build_trie_native(patterns, n_symbols)
        trie = DoubleArrayTrie(base, check, value, n_symbols, 5, inherit)
        for i in range(0, len(patterns), 997):
            assert trie.lookup(patterns[i]) == i


class TestNativeTensorizer:
    def test_matches_python(self):
        texts = ["まぁ社長は火星猫だ", "Rustで良い", "abc123", "🤌🏿"]
        lines = [t.encode("utf-8") for t in texts]
        L = 16
        cps, types, lengths = tensorize_native(lines, L)
        for i, t in enumerate(texts):
            s = Sentence.from_raw(t)
            n = len(s)
            assert lengths[i] == n
            assert cps[i, :n].tolist() == s.codepoints.tolist()
            assert types[i, :n].tolist() == list(s.char_types)
            assert (cps[i, n:] == 0).all()

    def test_truncation(self):
        cps, types, lengths = tensorize_native(["あいうえお".encode()], 3)
        assert lengths[0] == 3
        assert cps.shape == (1, 3)


class TestNativeCompileMatcher:
    """native/compile_matcher.cc vs the Python merge+pack path.

    Both paths share the native trie builder, so every output table must be
    bit-identical: merge semantics (predictor.rs:149-165), suffix
    propagation (char_scorer.rs:50-78), projection, fixed-8 packing."""

    def _rand_model(self, seed, n_ngrams=40, n_words=30):
        import random

        from vaporetto_tpu.models.model import (
            Model,
            NgramData,
            WordWeightRecord,
        )

        random.seed(seed)

        def rword(n, lo=0x61, hi=0x7A):
            return "".join(chr(random.randint(lo, hi)) for _ in range(n))

        ngrams = [
            NgramData(
                rword(random.randint(1, 4)),
                [random.randint(-100, 100) for _ in range(random.randint(1, 6))],
            )
            for _ in range(n_ngrams)
        ]
        words = list({rword(random.randint(1, 12)) for _ in range(n_words)})
        dicts = [
            WordWeightRecord(
                w, [random.randint(-50, 50) for _ in range(len(w) + 1)], ""
            )
            for w in words
        ]
        tngrams = [
            NgramData(
                bytes(random.randint(1, 6) for _ in range(random.randint(1, 5))),
                [random.randint(-30, 30) for _ in range(random.randint(1, 6))],
            )
            for _ in range(max(n_ngrams // 2, 1))
        ]
        return Model(ngrams, tngrams, dicts, -10, 3, 4, [])

    def test_equivalence_random(self, monkeypatch):
        import vaporetto_tpu.native as native_mod
        from vaporetto_tpu.compile.compiler import compile_model

        fields = (
            "rows_first", "rows_cnt", "w8", "off",
            "value", "inherit", "base", "check",
        )
        for seed in range(4):
            m = self._rand_model(seed)
            fast_cm = compile_model(m)
            with monkeypatch.context() as mp:
                mp.setattr(
                    native_mod, "compile_matcher_native", lambda *a, **k: None
                )
                py_cm = compile_model(m)
            for side in ("char_matcher", "type_matcher"):
                a = getattr(fast_cm, side)
                b = getattr(py_cm, side)
                for f in fields:
                    assert np.array_equal(getattr(a, f), getattr(b, f)), (
                        seed, side, f,
                    )
                assert a.max_len == b.max_len
                assert a.max_chunks == b.max_chunks
            assert np.array_equal(fast_cm.char_sym_table, py_cm.char_sym_table)
            assert fast_cm.char_hash_mul == py_cm.char_hash_mul
            assert fast_cm.char_hash_shift == py_cm.char_hash_shift
            assert np.array_equal(fast_cm.char_hash_keys, py_cm.char_hash_keys)
            assert np.array_equal(fast_cm.char_hash_syms, py_cm.char_hash_syms)
            assert fast_cm.pad_left == py_cm.pad_left
            assert fast_cm.pad_right == py_cm.pad_right

    def test_duplicate_and_suffix_patterns(self, monkeypatch):
        """Duplicates must merge; suffix weights must propagate."""
        import vaporetto_tpu.native as native_mod
        from vaporetto_tpu.compile.compiler import compile_model
        from vaporetto_tpu.models.model import Model, NgramData

        ngrams = [
            NgramData("abc", [1, 2, 3]),
            NgramData("bc", [10, 20]),
            NgramData("c", [100]),
            NgramData("abc", [5, 5, 5]),  # duplicate of first
            NgramData("xc", [7]),
        ]
        m = Model(ngrams, [], [], 0, 3, 3, [])
        fast_cm = compile_model(m)
        with monkeypatch.context() as mp:
            mp.setattr(
                native_mod, "compile_matcher_native", lambda *a, **k: None
            )
            py_cm = compile_model(m)
        a, b = fast_cm.char_matcher, py_cm.char_matcher
        assert np.array_equal(a.w8, b.w8)
        assert np.array_equal(a.off, b.off)
        assert np.array_equal(a.rows_first, b.rows_first)
        assert np.array_equal(a.rows_cnt, b.rows_cnt)

    def test_equivalence_with_tags(self, monkeypatch):
        """Tag rows: asymmetric tag_info merge + suffix propagation parity."""
        import random

        import vaporetto_tpu.native as native_mod
        from vaporetto_tpu.compile.compiler import compile_model
        from vaporetto_tpu.models.model import (
            Model, NgramData, TagModel, TagNgramData, TagWeight,
            WordWeightRecord,
        )

        def rword(n, lo=0x61, hi=0x6A):
            return "".join(chr(random.randint(lo, hi)) for _ in range(n))

        for seed in range(3):
            random.seed(seed)
            ngrams = [
                NgramData(rword(random.randint(1, 4)),
                          [random.randint(-100, 100)
                           for _ in range(random.randint(1, 6))])
                for _ in range(30)
            ]
            words = list({rword(random.randint(1, 8)) for _ in range(20)})
            dicts = [
                WordWeightRecord(
                    w, [random.randint(-50, 50) for _ in range(len(w) + 1)], ""
                )
                for w in words
            ]
            tms = []
            for t in random.sample(words, 6):
                cn = [
                    TagNgramData(
                        rword(random.randint(1, 3)),
                        [TagWeight(random.randint(0, 3),
                                   [random.randint(-20, 20)
                                    for _ in range(random.randint(1, 4))])
                         for _ in range(2)],
                    )
                    for _ in range(4)
                ]
                tn = [
                    TagNgramData(
                        bytes(random.randint(1, 6)
                              for _ in range(random.randint(1, 3))),
                        [TagWeight(random.randint(0, 4),
                                   [random.randint(-20, 20)
                                    for _ in range(2)])],
                    )
                    for _ in range(3)
                ]
                tms.append(
                    TagModel(t, [[f"t{i}" for i in range(3)]], cn, tn,
                             [0, 0, 0])
                )
            tngrams = [
                NgramData(
                    bytes(random.randint(1, 6)
                          for _ in range(random.randint(1, 3))),
                    [random.randint(-30, 30)],
                )
                for _ in range(10)
            ]
            m = Model(ngrams, tngrams, dicts, -10, 3, 4, tms)
            fast_cm = compile_model(m, predict_tags=True)
            with monkeypatch.context() as mp:
                mp.setattr(
                    native_mod, "compile_matcher_native",
                    lambda *a, **k: None,
                )
                py_cm = compile_model(m, predict_tags=True)
            for side in ("char_matcher", "type_matcher"):
                a = getattr(fast_cm, side)
                b = getattr(py_cm, side)
                for f in ("rows_first", "rows_cnt", "w8", "off",
                          "value", "inherit", "base", "check"):
                    assert np.array_equal(getattr(a, f), getattr(b, f)), (
                        seed, side, f,
                    )
                ta, tb = a.tag_weight, b.tag_weight
                assert (ta is None) == (tb is None)
                if ta is None:
                    continue
                assert len(ta) == len(tb)
                for x, y in zip(ta, tb):
                    assert len(x) == len(y)
                    for dx, dy in zip(x, y):
                        assert set(dx) == set(dy), (seed, side)
                        for kk in dx:
                            assert [int(v) for v in dx[kk]] == [
                                int(v) for v in dy[kk]
                            ], (seed, side, kk)
