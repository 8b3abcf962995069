"""Data-parallel / mesh tests (virtual 8-device CPU mesh)."""

import numpy as np
import pytest

import jax

from vaporetto_tpu.models.model import Model
from vaporetto_tpu.parallel.data import Batch, batched_lines, host_shard
from vaporetto_tpu.parallel.mesh import (
    make_mesh,
    shard_predict_fn,
    train_step_dryrun,
)
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence

from test_scorers import create_test_model

N_DEV = len(jax.devices())


@pytest.fixture(scope="module")
def predictor():
    return Predictor(create_test_model(), False)


class TestMesh:
    def test_sharded_predict_matches_single(self, predictor):
        mesh = make_mesh(N_DEV)
        fn = shard_predict_fn(predictor, mesh)
        texts = ["この人は地球人だ", "人だ地球", "地球人だ", "この地球"] * (
            2 * N_DEV
        )
        sents = [Sentence.from_raw(t) for t in texts]
        from vaporetto_tpu.utils.batch import tensorize

        cps, cts, lengths = tensorize(sents)
        scores, _, _ = fn(cps, cts, lengths)
        ref = [Sentence.from_raw(t) for t in texts]
        predictor.predict_batch(ref)
        pad = predictor.compiled.pad_left
        for i, s in enumerate(ref):
            n = len(s)
            got = np.asarray(scores)[i, pad : pad + n - 1].tolist()
            assert got == s.boundary_scores_list()

    def test_train_step_dryrun(self):
        train_step_dryrun(make_mesh(N_DEV))


class TestDataPipeline:
    def test_host_shard(self):
        lines = [f"line{i}" for i in range(10)]
        s0 = host_shard(lines, 0, 2)
        s1 = host_shard(lines, 1, 2)
        assert [i for i, _ in s0] == [0, 2, 4, 6, 8]
        assert [i for i, _ in s1] == [1, 3, 5, 7, 9]
        assert len(s0) + len(s1) == 10

    def test_batched_lines_shapes_and_content(self):
        lines = ["まぁ社長", "は", "火星猫だよとても長い文章です" * 3, "猫だ"]
        batches = list(batched_lines(list(enumerate(lines)), batch_size=2))
        covered = set()
        for b in batches:
            B, L = b.codepoints.shape
            assert B == 2
            assert (L & (L - 1)) == 0  # power of two
            for r in range(B):
                i = b.line_indices[r]
                if i < 0:
                    assert b.lengths[r] == 0
                    continue
                covered.add(int(i))
                text = lines[i]
                assert b.lengths[r] == len(text)
                cps = b.codepoints[r, : len(text)]
                assert cps.tolist() == [ord(c) for c in text]
        assert covered == set(range(len(lines)))

    def test_batched_lines_predict_equivalence(self, predictor):
        lines = ["この人は地球人だ", "人だ", "地球", "この人はこの人だ", "地球人"]
        expected = []
        for t in lines:
            s = Sentence.from_raw(t)
            predictor.predict(s)
            expected.append(s.boundary_scores_list())
        pad = predictor.compiled.pad_left
        got = {}
        for b in batched_lines(list(enumerate(lines)), batch_size=4):
            B, L = b.codepoints.shape
            fn = predictor._predict_fn(B, L)
            scores, _, _ = fn(b.codepoints, b.char_types, b.lengths)
            scores = np.asarray(scores)
            for r in range(B):
                i = int(b.line_indices[r])
                if i >= 0:
                    n = int(b.lengths[r])
                    got[i] = scores[r, pad : pad + n - 1].tolist()
        for i, exp in enumerate(expected):
            assert got[i] == exp


class TestShardedServe:
    """The sharded lean serving kernel: batch on dp, tables replicated."""

    def test_zero_collectives_in_hlo(self, predictor):
        """Embarrassing data parallelism, verified structurally: the
        optimized sharded program contains no collective ops at any mesh
        size — scaling is linear by construction (PERF.md)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vaporetto_tpu.parallel.mesh import make_mesh

        for n in (2, 8):
            mesh = make_mesh(n)
            fn = predictor.serve_boundaries_fn(mesh=mesh)
            B, L = 16 * n, 32
            lowered = jax.jit(lambda c, l: fn(c, l)).lower(
                jax.ShapeDtypeStruct(
                    (B, L), jnp.uint16,
                    sharding=NamedSharding(mesh, P("dp", None)),
                ),
                jax.ShapeDtypeStruct(
                    (B,), jnp.int32,
                    sharding=NamedSharding(mesh, P("dp")),
                ),
            )
            hlo = lowered.compile().as_text()
            for op in ("all-reduce", "all-gather", "all-to-all",
                       "collective-permute", "reduce-scatter"):
                assert op not in hlo, f"{op} at mesh size {n}"

    def test_sharded_serve_matches_unsharded(self, predictor):
        import jax
        import numpy as np

        from vaporetto_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        fn_sharded = predictor.serve_boundaries_fn(mesh=mesh)
        fn_plain = predictor.serve_boundaries_fn()
        rng = np.random.default_rng(2)
        cps = rng.integers(0x3041, 0x3097, (32, 24)).astype(np.uint16)
        lengths = rng.integers(1, 25, 32).astype(np.int32)
        a = np.asarray(fn_sharded(cps, lengths))
        b = np.asarray(fn_plain(cps, lengths))
        assert (a == b).all()

    def test_predict_cli_dp_flag(self):
        """predict --dp N on the virtual mesh, output identical to
        unsharded."""
        import subprocess
        import sys

        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
        corpus = "まぁ社長は火星猫だ\nまぁ良いだろう\n火星猫だ\n人だ\n"
        outs = {}
        for name, flags in (("dp", ["--dp", "4", "--batch-size", "4"]),
                            ("plain", ["--batch-size", "4"])):
            out = subprocess.run(
                [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                 "--model", "/root/reference/resources/model.bin", *flags],
                input=corpus, capture_output=True, text=True,
                timeout=560, env=env,
            )
            assert out.returncode == 0, out.stderr
            outs[name] = out.stdout
        assert outs["dp"] == outs["plain"]

    def test_predict_cli_dp_with_tags_and_scores(self):
        """--dp composes with the round-3 lean modes (device tag pass,
        int32 score readback): sharded output identical to unsharded."""
        import subprocess
        import sys

        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
        corpus = "まぁ社長は火星猫だ\nまぁ良いだろう\n火星猫だ\n人だ\n"
        for extra in (["--predict-tags"], ["--scores"]):
            outs = {}
            for name, flags in (("dp", ["--dp", "4"]), ("plain", [])):
                out = subprocess.run(
                    [sys.executable, "-m", "vaporetto_tpu.cli.predict",
                     "--model", "/root/reference/resources/model.bin",
                     "--batch-size", "4", *extra, *flags],
                    input=corpus, capture_output=True, text=True,
                    timeout=560, env=env,
                )
                assert out.returncode == 0, out.stderr
                outs[name] = out.stdout
            assert outs["dp"] == outs["plain"], extra


class TestShardedTraining:
    """Data-parallel training is user-reachable (train --dp N), not just a
    dryrun: the solver's example matrix shards over the mesh and the model
    that comes out matches single-device training."""

    CORPUS = [
        "これ は テスト です",
        "これ も テスト です",
        "テスト は 大事 です",
        "大事 な テスト",
        "良い テスト と 悪い テスト",
        "それ は それ で 良い",
    ]

    def _train(self, mesh, solver=5, tags=False):
        from vaporetto_tpu.train.trainer import Trainer

        corpus = self.CORPUS
        if tags:
            corpus = [
                "これ/代名詞 は/助詞 テスト/名詞 です/助動詞",
                "これ/代名詞 も/助詞 テスト/名詞 です/助動詞",
                "テスト/名詞 は/助詞 これ/代名詞 です/助動詞",
                "それ/代名詞 は/助詞 テスト/名詞 かも/助詞",
            ]
        trainer = Trainer(3, 3, 3, 3, [], 4)
        for line in corpus:
            trainer.add_example(Sentence.from_tokenized(line))
        return trainer.train(0.01, 1.0, solver, mesh=mesh)

    @pytest.mark.parametrize("solver", [0, 5])
    def test_sharded_matches_single_device(self, solver):
        mesh = make_mesh(N_DEV)
        m_sharded = self._train(mesh, solver=solver)
        m_single = self._train(None, solver=solver)
        # float reduction order may differ across shardings; the quantized
        # integer weights must still agree (same objective, same FISTA path)
        assert m_sharded.bias == m_single.bias
        a = {d.ngram: d.weights for d in m_sharded.char_ngram_model}
        b = {d.ngram: d.weights for d in m_single.char_ngram_model}
        assert set(a) == set(b)
        for k in a:
            assert np.max(np.abs(np.array(a[k]) - np.array(b[k]))) <= 1, k
        # and the trained model reproduces the training data
        pred = Predictor(m_sharded)
        correct = total = 0
        for line in self.CORPUS:
            gold = Sentence.from_tokenized(line)
            s = Sentence.from_raw(gold.as_raw_text())
            pred.predict(s)
            total += len(gold.boundaries)
            correct += int(
                np.sum(np.asarray(gold.boundaries) == np.asarray(s.boundaries))
            )
        assert correct / total >= 0.95

    def test_sharded_tag_training(self):
        mesh = make_mesh(N_DEV)
        model = self._train(mesh, solver=5, tags=True)
        assert model.tag_models
        pred = Predictor(model, True)
        s = Sentence.from_raw("これはテストです")
        pred.predict(s)
        s.fill_tags()
        assert s.write_tokenized_text() == "これ/代名詞 は/助詞 テスト/名詞 です/助動詞"

    def test_train_cli_dp_flag(self, tmp_path):
        import subprocess
        import sys

        corpus = tmp_path / "corpus.txt"
        corpus.write_text("\n".join(self.CORPUS) + "\n")
        env = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": "/root/repo", "HOME": "/root",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
        models = {}
        for name, flags in (("dp", ["--dp", "4"]), ("plain", [])):
            model_path = tmp_path / f"model_{name}.zst"
            out = subprocess.run(
                [sys.executable, "-m", "vaporetto_tpu.cli.train",
                 "--tok", str(corpus), "--model", str(model_path),
                 "--solver", "5", *flags],
                capture_output=True, text=True, timeout=560, env=env,
            )
            assert out.returncode == 0, out.stderr
            models[name] = Model.read(str(model_path))
        assert models["dp"].bias == models["plain"].bias
        a = {d.ngram: d.weights for d in models["dp"].char_ngram_model}
        b = {d.ngram: d.weights for d in models["plain"].char_ngram_model}
        assert set(a) == set(b)
