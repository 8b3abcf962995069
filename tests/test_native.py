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
