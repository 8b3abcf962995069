"""Tag-path throughput benchmark: native batched tag scorer vs the pure
Python walk, on a tag-dense synthetic corpus (every token carries a tag
model — the worst case for the tag pass).

Usage: python benchmarks/tag_bench.py [n_sentences]
Prints a small JSON report. CPU-only (the tag pass is host-side); run
anywhere.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_tagged_model(n_tokens=300, seed=5):
    from vaporetto_tpu.models.model import (
        Model, NgramData, TagModel, TagNgramData, TagWeight,
    )

    rng = np.random.default_rng(seed)
    chars = [chr(c) for c in range(0x3041, 0x3093)]

    def rand_word(lo, hi):
        return "".join(
            rng.choice(chars) for _ in range(int(rng.integers(lo, hi)))
        )

    tokens = sorted({rand_word(1, 5) for _ in range(n_tokens)})
    tag_models = []
    for tok in tokens:
        # KyTea-style density: one POS slot with many candidates plus a
        # reading slot; ~10 char-side and a few type-side tag n-grams
        slots = [[f"N{i}" for i in range(8)], [f"R{i}" for i in range(4)]]
        n_classes = 12
        char_ngrams = []
        for _ in range(10):
            ng = rand_word(0, 3) + tok + rand_word(0, 3)
            ws = [
                TagWeight(
                    int(rng.integers(0, 4)),  # rel <= char window (3)
                    [int(x) for x in rng.integers(-20, 21, n_classes)],
                )
            ]
            char_ngrams.append(TagNgramData(ng, ws))
        type_ngrams = []
        for _ in range(3):
            tng = bytes(
                rng.integers(1, 7, size=int(rng.integers(1, 4))).tolist()
            )
            ws = [
                TagWeight(
                    int(rng.integers(0, 3)),  # rel <= type window (2)
                    [int(x) for x in rng.integers(-20, 21, n_classes)],
                )
            ]
            type_ngrams.append(TagNgramData(tng, ws))
        bias = [int(x) for x in rng.integers(-10, 11, n_classes)]
        tag_models.append(TagModel(tok, slots, char_ngrams, type_ngrams, bias))
    ngrams = [
        NgramData(rand_word(1, 4), [int(x) for x in rng.integers(-9, 10, 5)])
        for _ in range(200)
    ]
    model = Model(
        ngrams, [NgramData(bytes([1]), [2, -3, 4, 1, 2])], [], 1, 3, 2,
        tag_models=tag_models,
    )
    return model, tokens


def legacy_tag_pass(pred, sentences):
    """Round-1's per-token Python tag loop, verbatim semantics: per-gap
    Python walk, per-token dict lookups and numpy adds, per-call position
    maps. The baseline the native scorer is measured against."""
    c = pred.compiled
    meta = c.tag_meta

    def add_tag_scores(tag_weight, states, pos, scores):
        n = len(states)
        for j, table in enumerate(tag_weight):
            if pos + j >= n:
                break
            state = int(states[pos + j])
            if state < 0:
                continue
            w = table.get(state)
            if w is not None:
                k = min(len(w), len(scores))
                scores[:k] += np.asarray(w[:k], dtype=np.int32)

    def tag_token(sentence, start, end):
        pos_map = np.arange(len(sentence) + 1, dtype=np.int64)
        token = sentence.text[pos_map[start] : pos_map[end]]
        token_id = meta.token_ids.get(token)
        if token_id is None:
            return
        bias = meta.bias[token_id]
        scores = np.zeros(max(8, len(bias)), dtype=np.int32)
        scores[: len(bias)] = bias
        pos = end - 1
        if c.char_matcher is not None and c.char_matcher.tag_weight is not None:
            add_tag_scores(c.char_matcher.tag_weight[token_id],
                           sentence.char_pma_states, pos, scores)
        if c.type_matcher is not None and c.type_matcher.tag_weight is not None:
            add_tag_scores(c.type_matcher.tag_weight[token_id],
                           sentence.type_pma_states, pos, scores)
        tags = meta.tags[token_id]
        n_tags = sentence.n_tags
        offset = 0
        for slot, cands in enumerate(tags):
            if slot >= n_tags:
                break
            if len(cands) >= 2:
                seg = scores[offset : offset + len(cands)]
                idx = 0
                best = None
                for i, v in enumerate(seg):
                    if best is None or int(v) > best:
                        idx = i
                        best = int(v)
                sentence.tags[pos * n_tags + slot] = cands[idx]
                offset += len(cands)
            else:
                sentence.tags[pos * n_tags + slot] = (
                    cands[0] if cands else None
                )

    for s in sentences:
        n = len(s)
        s.n_tags = c.n_tags
        s.tags = [None] * (n * c.n_tags)
        range_start = 0
        for i, b in enumerate(np.asarray(s.boundaries)):
            b = int(b)
            if b == 2:
                range_start = None
            elif b == 1:
                if range_start is not None:
                    tag_token(s, range_start, i + 1)
                range_start = i + 1
        if range_start is not None:
            tag_token(s, range_start, n)


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vaporetto_tpu.predictor import Predictor
    from vaporetto_tpu.sentence import Sentence

    n_sents = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    model, tokens = build_tagged_model()
    rng = np.random.default_rng(0)
    texts = [
        "".join(rng.choice(tokens) for _ in range(12)) for _ in range(n_sents)
    ]

    def run(mode: str):
        pred = Predictor(model, True)
        if mode == "python":
            pred._tag_scorer_obj = None
        elif mode == "native":
            pred._tag_scorer()  # build outside the timed region
        sents = [Sentence.from_raw(t) for t in texts]
        for i in range(0, len(sents), 512):
            pred.predict_batch(sents[i : i + 512])
        n_chars = sum(len(s) for s in sents)
        t0 = time.perf_counter()
        if mode == "legacy":
            legacy_tag_pass(pred, sents)
        else:
            for i in range(0, len(sents), 512):
                pred.predict_tags_batch(sents[i : i + 512])
        dt = time.perf_counter() - t0
        return dt, n_chars, sents

    def run_device():
        """The round-3 lean device tag pipeline, end to end: uint16
        tensorize -> serve_tags kernel (spans + token lookup + scoring +
        argmax ON DEVICE) -> readback -> native tag detokenizer. Unlike
        the host modes this includes boundary prediction itself."""
        from vaporetto_tpu.native import (
            TagEmitPlan, detok_tags_native, tensorize16_native,
        )
        from vaporetto_tpu.predictor import Predictor
        from vaporetto_tpu.utils.batch import bucket_length

        pred = Predictor(model, True)
        if pred.device_tag_tables() is None:
            return None
        fn = pred.serve_tags_fn()
        plan = TagEmitPlan(pred.compiled.tag_meta, pred.compiled.n_tags)
        blob = np.frombuffer(
            ("\n".join(texts) + "\n").encode("utf-8"), dtype=np.uint8
        )
        nl = np.flatnonzero(blob == 0x0A)
        starts = np.empty(len(nl), dtype=np.int64)
        starts[0] = 0
        starts[1:] = nl[:-1] + 1
        ends = nl
        L = bucket_length(max(len(t) for t in texts) + 1)
        cps, lens = tensorize16_native(blob, starts, ends, L)
        np.asarray(fn(cps, lens)[0])  # warm-up / compile
        t0 = time.perf_counter()
        cps, lens = tensorize16_native(blob, starts, ends, L)
        bnd, tid, ch = fn(cps, lens)
        data = detok_tags_native(
            blob, starts, ends, np.asarray(bnd), np.asarray(tid),
            np.asarray(ch), plan,
        )
        assert data
        return time.perf_counter() - t0

    dt_native, n_chars, sn = run("native")
    dt_python, _, sp = run("python")
    dt_legacy, _, sl = run("legacy")
    dt_device = run_device()
    for a, b, c in zip(sn, sp, sl):
        assert a.tags == b.tags == c.tags, "tag path mismatch"
    print(
        json.dumps(
            {
                "n_sentences": n_sents,
                "n_chars": n_chars,
                "tag_pass_native_s": round(dt_native, 4),
                "tag_pass_python_s": round(dt_python, 4),
                "tag_pass_legacy_r1_s": round(dt_legacy, 4),
                "speedup_vs_python": round(dt_python / dt_native, 1),
                "speedup_vs_legacy_r1": round(dt_legacy / dt_native, 1),
                "native_mchars_per_s": round(n_chars / dt_native / 1e6, 2),
                # full pipeline (incl. boundary prediction), device tag
                # pass; host modes above time the tag pass alone
                "device_e2e_mchars_per_s": (
                    round(n_chars / dt_device / 1e6, 2)
                    if dt_device else None
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
