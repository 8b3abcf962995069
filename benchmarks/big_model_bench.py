"""Big-model serve-kernel timing (the PERF.md scale-behavior row).

Builds the round-3 synthetic scale model (50k dictionary words of length
2-7 + 3k char n-grams + type n-grams; max pattern length 7 => 7 windowed
walk steps) and times the lean serve kernel at (8192, 256) with the
readback-grounded serialized loop (the only trustworthy timing on the
axon tunnel; see PERF.md). The reference streams such dictionaries
through daachorse at the same asymptotic cost per char
(char_scorer/boundary_scorer.rs:67-74); this records how the parallel
windowed walk scales with max pattern length on this device.

Usage: python benchmarks/big_model_bench.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_big_model(n_words: int = 50_000, n_ngrams: int = 3_000):
    from vaporetto_tpu.models.model import Model, NgramData, WordWeightRecord

    rng = np.random.default_rng(17)
    pools = np.concatenate([
        np.arange(0x3041, 0x3097),
        np.arange(0x30A1, 0x30FB),
        np.arange(0x4E00, 0x5800),
    ]).astype(np.int64)

    def rand_str(n):
        return "".join(chr(c) for c in pools[rng.integers(0, len(pools), n)])

    words = set()
    while len(words) < n_words:
        words.add(rand_str(int(rng.integers(2, 8))))
    ngrams = set()
    while len(ngrams) < n_ngrams:
        ngrams.add(rand_str(int(rng.integers(1, 4))))
    char_ngram = [
        NgramData(g, [int(w) for w in rng.integers(-500, 500, 7 - len(g))])
        for g in sorted(ngrams)
    ]
    dict_model = [
        WordWeightRecord(w, [int(x) for x in rng.integers(-500, 500,
                                                          len(w) + 1)])
        for w in sorted(words)
    ]
    type_ngram = [
        NgramData(bytes(t), [int(w) for w in rng.integers(-200, 200, 4)])
        for t in [(3,), (4,), (5,), (3, 5), (5, 5), (5, 3, 3)]
    ]
    return Model(char_ngram, type_ngram, dict_model, bias=-100,
                 char_window_size=3, type_window_size=3)


def main() -> int:
    from vaporetto_tpu.predictor import Predictor
    from vaporetto_tpu.utils.jaxcfg import ensure_compilation_cache

    ensure_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    t0 = time.perf_counter()
    model = build_big_model()
    pred = Predictor(model, predict_tags=False)
    compile_s = time.perf_counter() - t0
    mx = pred.compiled.char_matcher.max_len
    slots = len(pred.compiled.char_matcher.base)

    B, L = 8192, 256
    rng = np.random.default_rng(42)
    pools = np.concatenate([
        np.arange(0x3041, 0x3097),
        np.arange(0x30A1, 0x30FB),
        np.arange(0x4E00, 0x5800),
    ])
    cps16 = pools[rng.integers(0, len(pools), (B, L))].astype(np.uint16)
    lengths = np.full(B, L, dtype=np.int32)

    serve_fn, tables = pred.serve_traced_fn()

    @jax.jit
    def serve_loop(cps, lengths, tables, n):
        def body(i, carry):
            cps_b, carry_b = lax.optimization_barrier((cps, carry))
            cps_b = cps_b + carry_b[:, :1].astype(cps_b.dtype)
            return serve_fn(cps_b, lengths, tables)

        init = jnp.zeros(
            (cps.shape[0], (cps.shape[1] - 1 + 7) // 8),
            dtype=jnp.uint8,
        )
        return lax.fori_loop(0, n, body, init)

    cps_d = jax.device_put(cps16)
    len_d = jax.device_put(lengths)
    out = serve_loop(cps_d, len_d, tables, 1)
    np.asarray(out[0, :1])  # prime the readback path (first-readback tax)
    counts = (2, 6, 10)
    raw = {n: [] for n in counts}
    for _ in range(3):
        for n in counts:
            t0 = time.perf_counter()
            np.asarray(serve_loop(cps_d, len_d, tables, n)[0, :1])
            raw[n].append(time.perf_counter() - t0)
    ns = np.array(counts, dtype=np.float64)
    ts = np.array([min(raw[n]) for n in counts])
    slope = float(((ns - ns.mean()) * (ts - ts.mean())).sum()
                  / ((ns - ns.mean()) ** 2).sum())
    print(json.dumps({
        "model": {"dict_words": 50_000, "char_ngrams": 3_000,
                  "trie_slots": slots, "max_len": mx,
                  "host_compile_s": round(compile_s, 2)},
        "shape": [B, L],
        "serve_ms_per_iter": round(slope * 1e3, 2),
        "mchars_per_s": round(B * L / slope / 1e6, 2),
        "raw_times_ms": {str(n): [round(t * 1e3, 1) for t in raw[n]]
                         for n in counts},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
