"""Native host predictor: bit-identical to the device pipeline.

The C++ evaluator (native/host_predictor.cc) runs the same compiled tables
via a sequential Aho-Corasick scan with reconstructed failure links; these
tests pin its equality with the device path (and hence the numpy oracle)
on the conformance fixtures, random models, both type-scorer variants,
tags, and long sentences.
"""

import numpy as np
import pytest

from vaporetto_tpu.compile.compiler import compile_model
from vaporetto_tpu.models.model import Model
from vaporetto_tpu.ops.host_reference import reference_scores
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence

from test_differential import random_model, random_text

MODEL_BIN = "/root/reference/resources/model.bin"
DOCS_TOK = "/root/reference/resources/docs.tok"

native = pytest.importorskip("vaporetto_tpu.native")
if not native.available():
    pytest.skip("native library unavailable", allow_module_level=True)


class TestHostPredictor:
    def test_docs_tok_conformance_with_tags(self):
        pred = Predictor(Model.read(MODEL_BIN), True, backend="host")
        with open(DOCS_TOK) as f:
            expected_lines = [line.rstrip("\n") for line in f]
        for expected in expected_lines:
            gold = Sentence.from_tokenized(expected)
            s = Sentence.from_raw(gold.as_raw_text())
            pred.predict(s)
            s.fill_tags()
            assert s.write_tokenized_text() == expected

    def test_host_equals_device_bundled_model(self):
        model = Model.read(MODEL_BIN)
        dev = Predictor(model, True)
        host = Predictor(model, True, backend="host")
        assert host._host() is not None
        rng = np.random.default_rng(7)
        for _ in range(10):
            text = random_text(rng, int(rng.integers(1, 80)))
            s_d = Sentence.from_raw(text)
            s_h = Sentence.from_raw(text)
            dev.predict(s_d)
            host.predict(s_h)
            assert s_h.boundary_scores_list() == s_d.boundary_scores_list()
            assert np.array_equal(s_h.boundaries, s_d.boundaries)
            assert np.array_equal(s_h.char_pma_states, s_d.char_pma_states)

    @pytest.mark.parametrize("seed", range(4))
    def test_random_models_vs_oracle(self, seed):
        rng = np.random.default_rng(100 + seed)
        model = random_model(rng, type_window=3 if seed % 2 else 4)
        pred = Predictor(model, False, backend="host")
        assert pred._host() is not None
        for _ in range(8):
            s = Sentence.from_raw(random_text(rng, int(rng.integers(1, 60))))
            pred.predict(s)
            expected = reference_scores(
                pred.compiled, s.codepoints, s.char_types
            )
            assert s.boundary_scores_list() == expected.tolist(), s.text

    def test_type_trie_variant(self):
        """prefer_type_trie exercises the host type-side AC scan."""
        rng = np.random.default_rng(42)
        model = random_model(rng, type_window=3)
        # predict_tags=True (no tag models -> empty tag_meta) keeps the
        # per-position state outputs exposed for the comparison below
        compiled = compile_model(model, True, prefer_type_trie=True)
        assert compiled.type_matcher is not None
        pred = Predictor(None, True, compiled=compiled, backend="host")
        assert pred._host() is not None
        dev = Predictor(None, True, compiled=compiled)
        for _ in range(8):
            text = random_text(rng, int(rng.integers(1, 60)))
            s_h = Sentence.from_raw(text)
            s_d = Sentence.from_raw(text)
            pred.predict(s_h)
            dev.predict(s_d)
            assert s_h.boundary_scores_list() == s_d.boundary_scores_list()
            assert np.array_equal(s_h.type_pma_states, s_d.type_pma_states)

    def test_long_sentence(self):
        """Host path handles beyond-threshold lengths without chunking."""
        model = Model.read(MODEL_BIN)
        host = Predictor(model, False, backend="host")
        dev = Predictor(model, False)
        rng = np.random.default_rng(3)
        text = random_text(rng, 9000)  # > LONG_SENTENCE_THRESHOLD
        s_h = Sentence.from_raw(text)
        s_d = Sentence.from_raw(text)
        host.predict(s_h)
        dev.predict(s_d)  # halo-chunked device path
        assert np.array_equal(s_h.boundaries, s_d.boundaries)
        assert s_h.boundary_scores_list() == s_d.boundary_scores_list()

    def test_artifact_roundtrip_host(self):
        """Host evaluator works on a deserialized compiled artifact."""
        pred = Predictor(Model.read(MODEL_BIN), True)
        blob = pred.serialize_to_vec()
        revived = Predictor.deserialize_from_slice(blob)
        revived.backend = "host"
        with open(DOCS_TOK) as f:
            expected = f.readline().rstrip("\n")
        gold = Sentence.from_tokenized(expected)
        s = Sentence.from_raw(gold.as_raw_text())
        revived.predict(s)
        assert revived._host() is not None
        s.fill_tags()
        assert s.write_tokenized_text() == expected


class TestScratchReuse:
    """predict_batch returns views into reused per-instance scratch
    buffers (the page-fault-churn fix): results must be correct on every
    call, and the predictor-level API must copy what it keeps."""

    def test_repeated_calls_stay_correct(self):
        pred = Predictor(Model.read(MODEL_BIN), False, backend="host")
        host = pred._host()
        if host is None:
            pytest.skip("native library unavailable")
        texts = ["まぁ社長は火星猫だ", "火星猫だ", "まぁ良いだろう"]
        sents = [Sentence.from_raw(t) for t in texts]
        expected = []
        for s in sents:
            r = host.predict_batch([s.codepoints], [s.char_types])
            expected.append(r[0][: int(r[1][1])].copy())
        # interleaved calls of different sizes over the same instance
        for _ in range(3):
            for s, exp in zip(sents, expected):
                r = host.predict_batch([s.codepoints], [s.char_types])
                assert (r[0][: len(exp)] == exp).all()

    def test_predictor_results_survive_later_calls(self):
        pred = Predictor(Model.read(MODEL_BIN), False, backend="host")
        if pred._host() is None:
            pytest.skip("native library unavailable")
        a = Sentence.from_raw("まぁ社長は火星猫だ")
        pred.predict(a)
        scores_a = a.boundary_scores.copy()
        b = Sentence.from_raw("まぁ良いだろう")
        pred.predict(b)  # overwrites the scratch buffers
        assert (a.boundary_scores == scores_a).all()
