"""Integration/conformance tests.

The reference pins behaviour with doctests over bundled fixtures
(resources/model.bin + resources/docs.tok, lib.rs:11-45); these are our
byte-identical conformance contract.
"""

import os
import subprocess
import sys

import pytest

from vaporetto_tpu.models.kytea import KyteaModel, kytea_to_model
from vaporetto_tpu.models.model import Model
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence

MODEL_BIN = "/root/reference/resources/model.bin"
KYTEA_BIN = "/root/reference/resources/kytea-model.bin"
DOCS_TOK = "/root/reference/resources/docs.tok"


@pytest.fixture(scope="module")
def predictor_tags():
    return Predictor(Model.read(MODEL_BIN), True)


class TestConformance:
    def test_docs_tok_exact(self, predictor_tags):
        """lib.rs:11-45 doctest: full tagged outputs on docs.tok."""
        with open(DOCS_TOK) as f:
            expected_lines = [line.rstrip("\n") for line in f]
        for expected in expected_lines:
            gold = Sentence.from_tokenized(expected)
            s = Sentence.from_raw(gold.as_raw_text())
            predictor_tags.predict(s)
            s.fill_tags()
            assert s.write_tokenized_text() == expected

    def test_boundaries_only(self):
        """predictor.rs:378-403 doctest (no tags)."""
        pred = Predictor(Model.read(MODEL_BIN), False)
        s = Sentence.from_raw("まぁ社長は火星猫だ")
        pred.predict(s)
        assert s.write_tokenized_text() == "まぁ 社長 は 火星 猫 だ"

    def test_batch_conformance(self, predictor_tags):
        with open(DOCS_TOK) as f:
            expected_lines = [line.rstrip("\n") for line in f]
        golds = [Sentence.from_tokenized(e) for e in expected_lines]
        sents = [Sentence.from_raw(g.as_raw_text()) for g in golds]
        predictor_tags.predict_batch(sents)
        for s, expected in zip(sents, expected_lines):
            s.fill_tags()
            assert s.write_tokenized_text() == expected


class TestKyteaConversion:
    def test_kytea_doctest(self):
        """kytea_model.rs:399-422 doctest."""
        model = kytea_to_model(KyteaModel.read(KYTEA_BIN))
        pred = Predictor(model, False)
        s = Sentence.from_raw("まぁ社長は火星猫だ")
        pred.predict(s)
        assert s.write_tokenized_text() == "まぁ 社長 は 火星 猫 だ"

    def test_converted_model_roundtrip(self, tmp_path):
        model = kytea_to_model(KyteaModel.read(KYTEA_BIN))
        path = tmp_path / "model.zst"
        with open(path, "wb") as f:
            model.write(f, zstd_level=19)
        model2 = Model.read(str(path))
        assert len(model2.char_ngram_model) == len(model.char_ngram_model)
        assert len(model2.dict_model) == len(model.dict_model)


class TestCLI:
    def test_predict_cli(self, tmp_path):
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.predict",
             "--model", MODEL_BIN, "--predict-tags"],
            input="まぁ社長は火星猫だ\n",
            capture_output=True, text=True, timeout=560,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        assert out.stdout == (
            "まぁ/名詞/マー 社長/名詞/シャチョー は/助詞/ワ "
            "火星/名詞/カセー 猫/名詞/ネコ だ/助動詞/ダ\n"
        )

    def test_predict_cli_scores_and_tag_scores(self):
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.predict",
             "--model", MODEL_BIN, "--predict-tags", "--scores",
             "--tag-scores"],
            input="まぁ社長は火星猫だ\n",
            capture_output=True, text=True, timeout=560,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        lines = out.stdout.splitlines()
        # tokenized line, then per-gap scores "i:ab score"
        assert lines[0].startswith("まぁ/名詞/マー")
        assert lines[1].startswith("0:まぁ ")
        assert all(":" in l for l in lines[1:9])
        # tag-scores block: token\ttag:score,... (reference format)
        tag_lines = [l for l in lines if "\t" in l]
        assert any(l.startswith("まぁ\t") for l in tag_lines)
        first = [l for l in tag_lines if l.startswith("まぁ\t")][0]
        cands = first.split("\t")[1]
        assert "名詞:" in cands and "," in cands

    def test_predict_cli_lean_matches_general(self):
        """The lean serving fast path (native tensorize -> uint16/int8
        device kernel -> native detokenize) must be byte-identical to the
        general Sentence path for the supported flag sets."""
        corpus = (
            "まぁ社長は火星猫だ\nまぁ良いだろう\n\n"
            "a b/c\\d\nABC123オレンジ\nア\n"
        )
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        for extra in ([], ["--wsconst", "K", "--wsconst", "D"],
                      ["--no-norm"], ["--wsconst", "G"],
                      ["--wsconst", "G", "--wsconst", "K"]):
            runs = {}
            for mode, flags in (("lean", []), ("general", ["--no-lean"])):
                out = subprocess.run(
                    [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                     "--model", MODEL_BIN, "--batch-size", "4",
                     *extra, *flags],
                    input=corpus, capture_output=True, text=True,
                    timeout=560, env=env,
                )
                assert out.returncode == 0, out.stderr
                runs[mode] = out.stdout
            assert runs["lean"] == runs["general"], extra

    def test_predict_cli_lean_tags_matches_general(self):
        """--predict-tags through the lean device tag pass must be
        byte-identical to the general path (device tag kernel + native
        tag-aware detokenizer vs Sentence.fill_tags)."""
        corpus = (
            "まぁ社長は火星猫だ\nまぁ良いだろう\n\n"
            "a b/c\\d\nABC123オレンジ\nア\n火星猫だ火星猫だ\n"
        )
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        for extra in ([], ["--wsconst", "K"], ["--no-norm"]):
            runs = {}
            for mode, flags in (("lean", []), ("general", ["--no-lean"])):
                out = subprocess.run(
                    [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                     "--model", MODEL_BIN, "--batch-size", "4",
                     "--predict-tags", *extra, *flags],
                    input=corpus, capture_output=True, text=True,
                    timeout=560, env=env,
                )
                assert out.returncode == 0, out.stderr
                runs[mode] = out.stdout
            assert runs["lean"] == runs["general"], extra

    def test_predict_cli_lean_scores_matches_general(self):
        """--scores through the lean path (int32 score readback + native
        formatter) must be byte-identical to the general path."""
        corpus = (
            "まぁ社長は火星猫だ\nまぁ良いだろう\n\n"
            "ABC123オレンジ\nア\n"
        )
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        for extra in ([], ["--no-norm"]):
            runs = {}
            for mode, flags in (("lean", []), ("general", ["--no-lean"])):
                out = subprocess.run(
                    [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                     "--model", MODEL_BIN, "--batch-size", "4",
                     "--scores", *extra, *flags],
                    input=corpus, capture_output=True, text=True,
                    timeout=560, env=env,
                )
                assert out.returncode == 0, out.stderr
                runs[mode] = out.stdout
            assert runs["lean"] == runs["general"], extra

    def test_predict_cli_lean_rich_combos_match_general(self):
        """The rich flag combinations — --scores --predict-tags,
        --tag-scores, and all three together (reference predict
        main.rs:65-91) — must be byte-identical between the lean device
        path and the general path."""
        corpus = (
            "まぁ社長は火星猫だ\nまぁ良いだろう\n\n"
            "a b/c\\d\nABC123オレンジ\nア\n火星猫だ火星猫だ\n"
        )
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        for extra in (
            ["--predict-tags", "--scores"],
            ["--predict-tags", "--tag-scores"],
            ["--predict-tags", "--scores", "--tag-scores"],
            ["--predict-tags", "--tag-scores", "--wsconst", "K"],
        ):
            runs = {}
            for mode, flags in (("lean", []), ("general", ["--no-lean"])):
                out = subprocess.run(
                    [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                     "--model", MODEL_BIN, "--batch-size", "4",
                     "--backend", "device", *extra, *flags],
                    input=corpus, capture_output=True, text=True,
                    timeout=560, env=env,
                )
                assert out.returncode == 0, out.stderr
                runs[mode] = out.stdout
            assert runs["lean"] == runs["general"], extra

    def test_evaluate_cli(self):
        with open(DOCS_TOK) as f:
            docs = f.read()
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.evaluate",
             "--model", MODEL_BIN, "--metric", "char"],
            input=docs, capture_output=True, text=True, timeout=560,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        assert "F1: 1" in out.stdout  # perfect on its own training sample
        assert "Precision: 1" in out.stdout

    def test_manipulate_model_cli(self, tmp_path):
        dump = tmp_path / "dict.csv"
        out_model = tmp_path / "out.bin"
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.manipulate_model",
             "--model-in", MODEL_BIN, "--dump-dict", str(dump),
             "--model-out", str(out_model)],
            capture_output=True, text=True, timeout=120,
            env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
                 "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        assert dump.exists() and out_model.exists()
        # the bundled model has an empty dictionary; replace it
        csv_text = "word,weights,comment\n火星猫,1 2 3 4,テスト\n"
        dict_csv = tmp_path / "new.csv"
        dict_csv.write_text(csv_text)
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.manipulate_model",
             "--model-in", MODEL_BIN, "--replace-dict", str(dict_csv),
             "--model-out", str(out_model)],
            capture_output=True, text=True, timeout=120,
            env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
                 "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        m = Model.read(str(out_model))
        assert [r.word for r in m.dictionary()] == ["火星猫"]
        assert m.dictionary()[0].get_weights() == [1, 2, 3, 4]
        assert m.dictionary()[0].get_comment() == "テスト"

    def test_convert_kytea_cli(self, tmp_path):
        out_model = tmp_path / "converted.zst"
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.convert_kytea_model",
             "--model-in", KYTEA_BIN, "--model-out", str(out_model)],
            capture_output=True, text=True, timeout=120,
            env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
                 "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        m = Model.read(str(out_model))
        assert m.char_ngram_model


class TestLineSemantics:
    """Reference BufRead::lines parity: '\n' is the only line terminator
    (a lone '\r' stays inside the line); one trailing '\r' is stripped
    (CRLF corpora). Both CLI paths must agree."""

    def _run(self, extra, data: bytes) -> bytes:
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.predict",
             "--model", MODEL_BIN, *extra],
            input=data, capture_output=True, timeout=560,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr.decode()
        return out.stdout

    def test_lone_cr_is_not_a_line_break(self):
        data = "火星\r猫\n".encode("utf-8")
        for extra in (["--no-lean"], []):
            stdout = self._run(extra, data)
            assert stdout.count(b"\n") == 1, (extra, stdout)
            assert b"\r" in stdout  # the CR stays inside the line

    def test_crlf_both_paths_identical(self):
        data = "まぁ社長は火星猫だ\r\nまぁ良いだろう\r\n".encode("utf-8")
        a = self._run([], data)
        b = self._run(["--no-lean"], data)
        assert a == b
        assert b"\r" not in a

    def test_unterminated_final_line_keeps_lone_cr(self):
        """BufRead::lines strips '\\r' only before '\\n': a file ending in
        'abc\\r' (no newline) keeps the CR on both paths."""
        data = "火星猫\nまぁ\r".encode("utf-8")
        for extra in (["--no-lean"], []):
            stdout = self._run(extra, data)
            assert stdout.endswith("\r\n".encode()), (extra, stdout)


class TestProfileFlag:
    def test_profile_writes_trace(self, tmp_path):
        """--profile captures a jax.profiler trace directory."""
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.predict",
             "--model", MODEL_BIN, "--profile", str(tmp_path / "tr")],
            input="まぁ社長は火星猫だ\n", capture_output=True, text=True,
            timeout=560,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
        )
        assert out.returncode == 0, out.stderr
        assert out.stdout == "まぁ 社長 は 火星 猫 だ\n"
        import glob

        files = glob.glob(str(tmp_path / "tr" / "**" / "*"),
                          recursive=True)
        assert any(os.path.isfile(f) for f in files), files


class TestInputOutputFlags:
    def test_single_process_input_output(self, tmp_path):
        """--input/--output are honored without --num-processes (both
        lean and general paths)."""
        corpus = "まぁ社長は火星猫だ\nまぁ良いだろう\n"
        (tmp_path / "in.txt").write_text(corpus, encoding="utf-8")
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        for flags in ([], ["--no-lean"]):
            out = subprocess.run(
                [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                 "--model", MODEL_BIN,
                 "--input", str(tmp_path / "in.txt"),
                 "--output", str(tmp_path / "out.txt"), *flags],
                stdin=subprocess.DEVNULL, capture_output=True, text=True,
                timeout=560, env=env,
            )
            assert out.returncode == 0, out.stderr
            got = (tmp_path / "out.txt").read_text(encoding="utf-8")
            assert got == "まぁ 社長 は 火星 猫 だ\nまぁ 良い だろう\n"

    def test_dp_with_num_processes_rejected(self):
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.predict",
             "--model", MODEL_BIN, "--num-processes", "2",
             "--process-id", "0", "--coordinator", "127.0.0.1:1",
             "--dp", "2",
             "--input", "/dev/null", "--output", "/tmp/x"],
            stdin=subprocess.DEVNULL, capture_output=True, text=True,
            timeout=120, env=env,
        )
        assert out.returncode == 2
        assert "--dp cannot combine" in out.stderr


class TestDictionaryProbe:
    def test_replace_dict_changes_segmentation_both_paths(self, tmp_path):
        """The verify-recipe dictionary probe: adding 星猫 with inside
        weight -99999 flips gap 星|猫 (32767 -> -67232) and merges
        火星猫 — on the lean AND general paths."""
        csv_path = tmp_path / "dict.csv"
        csv_path.write_text("word,weights,comment\n星猫,0 -99999 0,x\n",
                            encoding="utf-8")
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        probe = tmp_path / "probe.bin"
        out = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.manipulate_model",
             "--model-in", MODEL_BIN, "--replace-dict", str(csv_path),
             "--model-out", str(probe)],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert out.returncode == 0, out.stderr
        for flags in ([], ["--no-lean"]):
            out = subprocess.run(
                [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                 "--model", str(probe), *flags],
                input="まぁ社長は火星猫だ\n", capture_output=True,
                text=True, timeout=560, env=env,
            )
            assert out.returncode == 0, out.stderr
            assert out.stdout == "まぁ 社長 は 火星猫 だ\n", flags


class TestEvaluateBackendHost:
    def test_host_backend_matches_device(self):
        with open(DOCS_TOK) as f:
            gold = f.read()
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root"}
        outs = {}
        for backend in ("device", "host"):
            out = subprocess.run(
                [sys.executable, "-m", "vaporetto_tpu.cli.evaluate",
                 "--model", MODEL_BIN, "--metric", "word",
                 "--predict-tags", "--backend", backend],
                input=gold, capture_output=True, text=True, timeout=560,
                env=env,
            )
            assert out.returncode == 0, out.stderr
            outs[backend] = out.stdout
        assert outs["host"] == outs["device"]
        assert "F1: 1.0" in outs["host"]
