"""Device tag pass (predictor.serve_tags_fn) vs the host tag path.

The device pass — reversed-surface trie token recognition, hash-probed
(token, rel, state) weight gathers, per-slot masked argmax — must yield
exactly the tags of the established host path (predictor.predict_tags_batch,
itself pinned to the reference semantics by test_tag_scorer/test_scorers:
predictor.rs:546-637, TagPredictor::predict predictor.rs:286-304).
"""

import numpy as np
import pytest

from vaporetto_tpu.models.model import (
    Model,
    NgramData,
    TagModel,
    TagNgramData,
    TagWeight,
)
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence

from test_scorers import create_test_model


def _device_tags(pred, texts, wsconst=()):
    """Run the device tag kernel and reconstruct per-sentence flat tag
    lists the way the lean host side does (choices -> candidate strings)."""
    dt = pred.device_tag_tables()
    assert dt is not None
    meta = pred.compiled.tag_meta
    n_tags = pred.compiled.n_tags
    L = max(max(len(t) for t in texts) + 1, 8)
    B = len(texts)
    cps = np.zeros((B, L), dtype=np.uint16)
    lens = np.zeros(B, dtype=np.int32)
    for i, t in enumerate(texts):
        for j, ch in enumerate(t):
            cps[i, j] = ord(ch)
        lens[i] = len(t)
    fn = pred.serve_tags_fn(tuple(wsconst))
    res = fn(cps, lens)
    # round 5: boundaries arrive BIT-PACKED (8 gaps/byte); small models
    # fuse tid+choice into one uint16 word, larger ones return narrow
    # separate tensors
    bits = np.asarray(res[0])
    if fn.packed_tc:
        w = np.asarray(res[1])
        tid = (w & 0x7F).astype(np.int32) - 1
        choice = np.stack(
            [((w >> (7 + 4 * s)) & 0xF).astype(np.int32) - 1
             for s in range(fn.n_tag_slots)],
            axis=-1,
        )
    else:
        tid = np.asarray(res[1])
        choice = np.asarray(res[2])
    from vaporetto_tpu.predictor import unpack_gap_bits

    bnd = unpack_gap_bits(bits)[:, : L - 1]
    out = []
    for i, t in enumerate(texts):
        n = len(t)
        tags = [None] * (n * n_tags)
        for e in range(n):
            token_id = int(tid[i, e])
            if token_id < 0:
                continue
            for s, cands in enumerate(meta.tags[token_id]):
                if s >= n_tags:
                    break
                if len(cands) >= 2:
                    tags[e * n_tags + s] = cands[int(choice[i, e, s])]
                elif cands:
                    tags[e * n_tags + s] = cands[0]
        out.append((tags, bnd[i, : n - 1] if n else bnd[i, :0]))
    return out


def _host_tags(pred, texts):
    sents = [Sentence.from_raw(t) for t in texts]
    pred.predict_batch(sents)
    pred.predict_tags_batch(sents)
    return sents


def _assert_device_matches_host(model, texts):
    pred = Predictor(model, True)
    if pred.device_tag_tables() is None:
        pytest.skip("model has no device-packable tag tables")
    dev = _device_tags(pred, texts)
    host = _host_tags(pred, texts)
    for (dtags, dbnd), s in zip(dev, host):
        assert np.array_equal(dbnd.astype(np.uint8), s.boundaries)
        assert dtags == s.tags


class TestDeviceMatchesHost:
    def test_golden_model(self):
        _assert_device_matches_host(
            create_test_model(),
            ["この人は地球人だ", "人だ人だ", "地球", "人", "だ"],
        )

    def test_bundled_reference_model(self):
        model = Model.read("/root/reference/resources/model.bin")
        from conftest import docs_tok_raws

        texts = docs_tok_raws()
        assert all(len(t) >= 7 for t in texts)  # full multi-token lines
        _assert_device_matches_host(model, texts)

    def test_randomized_tagged_models(self):
        rng = np.random.default_rng(23)
        chars = [chr(c) for c in range(0x3041, 0x3061)]

        def rand_word(lo, hi):
            return "".join(
                rng.choice(chars) for _ in range(int(rng.integers(lo, hi)))
            )

        for trial in range(3):
            tokens = sorted({rand_word(1, 5) for _ in range(15)})
            tag_models = []
            for tok in tokens:
                slots = []
                for s in range(int(rng.integers(1, 4))):
                    n_c = int(rng.integers(0, 4))
                    slots.append([f"T{s}C{i}" for i in range(n_c)])
                n_classes = sum(len(c) for c in slots if len(c) >= 2)
                char_ngrams = []
                for _ in range(4):
                    ng = rand_word(1, 3) + tok
                    ws = [
                        TagWeight(
                            int(rng.integers(0, 3)),
                            [int(x) for x in
                             rng.integers(-20, 21, max(n_classes, 1))],
                        )
                    ]
                    char_ngrams.append(TagNgramData(ng, ws))
                type_ngrams = [
                    TagNgramData(
                        bytes([3] * int(rng.integers(1, 3))),
                        [TagWeight(
                            int(rng.integers(0, 3)),
                            [int(x) for x in
                             rng.integers(-9, 10, max(n_classes, 1))],
                        )],
                    )
                ]
                bias = [int(x)
                        for x in rng.integers(-10, 11, max(n_classes, 1))]
                tag_models.append(
                    TagModel(tok, slots, char_ngrams, type_ngrams, bias)
                )
            model = Model(
                [
                    NgramData(rand_word(1, 3),
                              [int(x) for x in rng.integers(-9, 10, 5)])
                    for _ in range(10)
                ],
                [NgramData(bytes([3]), [2, -3, 4, 1, 2])],
                [],
                1,
                2,
                2,
                tag_models=tag_models,
            )
            texts = [
                "".join(
                    rng.choice(tokens + [rand_word(1, 3)])
                    for _ in range(int(rng.integers(1, 8)))
                )
                for _ in range(12)
            ]
            _assert_device_matches_host(model, texts)


class TestShardedTagKernel:
    def test_mesh_equals_single(self):
        from vaporetto_tpu.parallel.mesh import make_mesh

        model = create_test_model()
        pred = Predictor(model, True)
        if pred.device_tag_tables() is None:
            pytest.skip("model has no device-packable tag tables")
        texts = ["この人は地球人だ", "人だ人だ", "地球", "人",
                 "この人", "地球人だ", "人", "だ"]
        single = _device_tags(pred, texts)
        mesh = make_mesh(4)
        fn = pred.serve_tags_fn((), mesh=mesh)
        L = max(max(len(t) for t in texts) + 1, 8)
        cps = np.zeros((len(texts), L), dtype=np.uint16)
        lens = np.zeros(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t):
                cps[i, j] = ord(ch)
            lens[i] = len(t)
        sharded = [np.asarray(x) for x in fn(cps, lens)]
        fn1 = pred.serve_tags_fn(())
        single = [np.asarray(x) for x in fn1(cps, lens)]
        assert len(sharded) == len(single)
        for a, b in zip(sharded, single):
            assert np.array_equal(a, b)


class TestPackingLimits:
    """build_device_tag_tables must refuse (-> host fallback) exactly the
    shapes its int8 choice output or uint16 token lookup cannot carry."""

    def _model_with(self, tok, slots, astral=False):
        bias_len = max(
            sum(len(c) for c in slots if len(c) >= 2), 1
        )
        tm = TagModel(tok, slots, [], [], [0] * bias_len)
        return Model(
            [NgramData("あ", [1, 2, 3])],
            [NgramData(bytes([3]), [1, 2, 3])],
            [], 0, 1, 1, tag_models=[tm],
        )

    def test_too_many_candidates_falls_back(self):
        slots = [[f"C{i}" for i in range(130)]]  # > int8 choice range
        pred = Predictor(self._model_with("あい", slots), True)
        assert pred.device_tag_tables() is None

    def test_astral_only_token_excluded(self):
        # a lexicon whose only token is astral can never match uint16
        # input -> no trie -> device tables unavailable
        slots = [["X", "Y"]]
        pred = Predictor(self._model_with("\U0001F431", slots), True)
        assert pred.device_tag_tables() is None

    def test_mixed_astral_token_skipped_but_rest_packs(self):
        m = Model(
            [NgramData("あ", [1, 2, 3])],
            [NgramData(bytes([3]), [1, 2, 3])],
            [], 0, 1, 1,
            tag_models=[
                TagModel("\U0001F431猫", [["A", "B"]], [], [], [0, 0]),
                TagModel("あい", [["C", "D"]], [], [], [0, 0]),
            ],
        )
        pred = Predictor(m, True)
        dt = pred.device_tag_tables()
        assert dt is not None
        # the BMP token is recognizable; the astral one is absent
        assert dt.rev_value.max() == 1  # token id 1 = "あい"
