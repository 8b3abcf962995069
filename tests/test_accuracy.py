"""End-to-end accuracy contract: train -> predict -> evaluate.

The reference defines accuracy operationally via the evaluate CLI
(SURVEY.md §3.3); here a synthetic vocabulary corpus with held-out
evaluation pins that the whole loop (feature extraction, solver,
quantization, compiled inference, metrics) learns real structure.
"""

import numpy as np
import pytest

from vaporetto_tpu.metrics import char_metric, word_metric
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence
from vaporetto_tpu.train.trainer import Trainer

VOCAB = [
    ("これ", "代名詞"), ("それ", "代名詞"), ("あれ", "代名詞"),
    ("は", "助詞"), ("が", "助詞"), ("も", "助詞"), ("を", "助詞"),
    ("テスト", "名詞"), ("犬", "名詞"), ("猫", "名詞"), ("家", "名詞"),
    ("学校", "名詞"), ("先生", "名詞"), ("電車", "名詞"),
    ("です", "助動詞"), ("でした", "助動詞"), ("だ", "助動詞"),
    ("見る", "動詞"), ("食べる", "動詞"), ("行く", "動詞"),
    ("大きい", "形容詞"), ("小さい", "形容詞"),
]


def make_corpus(rng, n_sentences, with_tags):
    lines = []
    for _ in range(n_sentences):
        n_tok = int(rng.integers(3, 8))
        toks = []
        for _ in range(n_tok):
            w, tag = VOCAB[int(rng.integers(0, len(VOCAB)))]
            toks.append(f"{w}/{tag}" if with_tags else w)
        lines.append(" ".join(toks))
    return lines


@pytest.mark.parametrize("solver", list(range(8)))
def test_heldout_f1(solver):
    """All 8 reference solver enums (trainer.rs:22-80) end to end; see
    solver.solver_loss_kind for the dual->primal objective mapping."""
    rng = np.random.default_rng(7)
    train = make_corpus(rng, 300, with_tags=False)
    test = make_corpus(rng, 50, with_tags=False)
    trainer = Trainer(3, 3, 3, 3, [], 4)
    for line in train:
        trainer.add_example(Sentence.from_tokenized(line))
    model = trainer.train(0.01, 1.0, solver)
    pred = Predictor(model, False)

    results = []
    for line in test:
        gold = Sentence.from_tokenized(line)
        s = Sentence.from_raw(gold.as_raw_text())
        pred.predict(s)
        results.append(
            ([int(b) for b in gold.boundaries], None,
             [int(b) for b in s.boundaries], None)
        )
    m = char_metric(results)
    assert m.f1 > 0.95, f"solver {solver}: char F1 {m.f1}"


@pytest.mark.parametrize("solver", [5, 4])
def test_heldout_word_f1_with_tags(solver):
    """Tag training e2e incl. enum 4: multi-candidate tag slots train the
    JOINT Crammer-Singer objective (train_crammer_singer)."""
    rng = np.random.default_rng(11)
    train = make_corpus(rng, 300, with_tags=True)
    test = make_corpus(rng, 40, with_tags=True)
    trainer = Trainer(3, 3, 3, 3, [], 4)
    for line in train:
        trainer.add_example(Sentence.from_tokenized(line))
    model = trainer.train(0.01, 1.0, solver)
    pred = Predictor(model, True)

    results = []
    for line in test:
        gold = Sentence.from_tokenized(line)
        n = gold.n_tags
        ref_b = [int(b) for b in gold.boundaries]
        ref_t = [gold.tags[i * n : (i + 1) * n] for i in range(len(ref_b) + 1)]
        s = Sentence.from_raw(gold.as_raw_text())
        pred.predict(s)
        s.fill_tags()
        sys_b = [int(b) for b in s.boundaries]
        k = s.n_tags
        sys_t = [s.tags[i * k : (i + 1) * k] for i in range(len(sys_b) + 1)]
        results.append((ref_b, ref_t, sys_b, sys_t))
    m = word_metric(results)
    assert m.f1 > 0.9, f"word F1 with tags {m.f1}"


class TestSolverConvergence:
    """The FISTA solver must reach (near-)optimal objective values. The
    hinge solver (enum 3) uses Nesterov smoothing — verified here against
    an independent optimizer (scipy L-BFGS) on the same objective."""

    def _problem(self, seed=5, n=200, d=20, k=6):
        rng = np.random.default_rng(seed)
        idx = rng.integers(1, d + 1, size=(n, k)).astype(np.int32)
        idx[:, -1] = d + 1  # bias feature
        val = np.ones((n, k), dtype=np.float32)
        w_true = rng.normal(size=d + 2)
        margins = np.array([
            w_true[idx[i]].sum() for i in range(n)
        ])
        y = np.where(margins + rng.normal(scale=0.5, size=n) > 0, 1.0, -1.0)
        return idx, val, y.astype(np.float32), d

    @pytest.mark.parametrize("solver", [0, 1, 2, 3, 7])
    def test_matches_scipy_objective(self, solver):
        from scipy.optimize import minimize

        from vaporetto_tpu.train.solver import (
            HINGE_SMOOTHING_MU,
            solver_loss_kind,
            train_binary,
            LOGISTIC,
            L2_HINGE,
        )

        idx, val, y, d = self._problem()
        cost = 1.0
        w, b = train_binary(idx, val, y, d, cost, 0.0001, solver,
                            max_iter=4000)
        w_full = np.concatenate([w, [b]])
        kind = solver_loss_kind(solver)
        mu = HINGE_SMOOTHING_MU

        def np_loss(m):
            if kind == LOGISTIC:
                return np.logaddexp(0.0, -m)
            if kind == L2_HINGE:
                return np.square(np.maximum(0.0, 1.0 - m))
            z = 1.0 - m
            return np.where(
                z <= 0, 0.0,
                np.where(z >= mu, z - 0.5 * mu, z * z / (2 * mu)),
            )

        def objective(wf):
            margins = np.array([
                wf[idx[i] - 1].sum() for i in range(len(y))
            ])
            return 0.5 * wf @ wf + cost * np_loss(y * margins).sum()

        ours = objective(w_full)
        res = minimize(objective, np.zeros(d + 1), method="L-BFGS-B",
                       options={"maxiter": 2000})
        assert ours <= res.fun * 1.01 + 1e-3, (
            f"solver {solver}: ours {ours} vs scipy {res.fun}"
        )

    def test_crammer_singer_matches_scipy_objective(self):
        """Enum 4 = the JOINT Crammer-Singer objective (LIBLINEAR
        MCSVM_CS, trainer.rs:22-47), not an OVR substitution. Verified on
        a small multiclass instance against scipy L-BFGS minimizing the
        SAME Nesterov-smoothed objective (analytic gradient), plus the
        smoothing-gap bound on the true non-smooth objective."""
        from scipy.optimize import minimize

        from vaporetto_tpu.train.solver import (
            CS_SMOOTHING_MU,
            train_crammer_singer,
        )

        rng = np.random.default_rng(13)
        n, d, k, C = 160, 15, 5, 4
        idx = rng.integers(1, d + 1, size=(n, k)).astype(np.int32)
        idx[:, -1] = d + 1  # bias feature
        val = np.ones((n, k), dtype=np.float32)
        W_true = rng.normal(size=(C, d + 2))
        margins_true = np.array(
            [[W_true[c][idx[i]].sum() for c in range(C)] for i in range(n)]
        )
        labels = margins_true.argmax(axis=1).astype(np.int32)
        cost = 1.0
        mu = CS_SMOOTHING_MU

        W, b = train_crammer_singer(idx, val, labels, C, d, cost, 1e-4,
                                    max_iter=6000)
        W_full = np.concatenate([W, b[:, None]], axis=1)  # (C, d+1)
        onehot = np.eye(C)[labels]

        def margins(Wf):
            # Wf: (C, d+1) over real features 1..d + bias
            return np.array(
                [[Wf[c][idx[i] - 1].sum() for c in range(C)]
                 for i in range(n)]
            )

        def smoothed_obj(Wf):
            m = margins(Wf)
            s = (m + (1.0 - onehot)) / mu
            smax = s.max(axis=1, keepdims=True)
            lse = smax[:, 0] + np.log(np.exp(s - smax).sum(axis=1))
            f = 0.5 * np.sum(Wf * Wf) + cost * np.sum(
                mu * lse - (m * onehot).sum(axis=1)
            )
            return f

        def true_obj(Wf):
            m = margins(Wf)
            s = m + (1.0 - onehot)
            return 0.5 * np.sum(Wf * Wf) + cost * np.sum(
                s.max(axis=1) - (m * onehot).sum(axis=1)
            )

        def scipy_fun(flat):
            Wf = flat.reshape(C, d + 1)
            m = margins(Wf)
            s = (m + (1.0 - onehot)) / mu
            smax = s.max(axis=1, keepdims=True)
            e = np.exp(s - smax)
            p = e / e.sum(axis=1, keepdims=True)
            lse = smax[:, 0] + np.log(e.sum(axis=1))
            f = 0.5 * np.sum(Wf * Wf) + cost * np.sum(
                mu * lse - (m * onehot).sum(axis=1)
            )
            dm = cost * (p - onehot)  # (n, C)
            g = Wf.copy()
            for i in range(n):
                for c in range(C):
                    np.add.at(g[c], idx[i] - 1, dm[i, c])
            return f, g.reshape(-1)

        ours_smooth = smoothed_obj(W_full)
        res = minimize(scipy_fun, np.zeros(C * (d + 1)), jac=True,
                       method="L-BFGS-B", options={"maxiter": 3000})
        assert ours_smooth <= res.fun * 1.01 + 1e-3, (
            f"CS smoothed: ours {ours_smooth} vs scipy {res.fun}"
        )
        # smoothing gap: true objective within mu*ln(C) per example of
        # the smoothed optimum
        gap = cost * n * mu * np.log(C)
        assert true_obj(W_full) <= res.fun * 1.01 + gap + 1e-3

    def test_crammer_singer_couples_classes(self):
        """The CS solution must differ from OVR squared hinge (the
        round-3 substitution) on a problem where they disagree — guards
        against enum 4 silently regressing to OVR."""
        from vaporetto_tpu.train.solver import (
            train_crammer_singer,
            train_one_vs_rest,
        )

        rng = np.random.default_rng(3)
        n, d, k, C = 120, 10, 4, 3
        idx = rng.integers(1, d + 1, size=(n, k)).astype(np.int32)
        idx[:, -1] = d + 1
        val = np.ones((n, k), dtype=np.float32)
        labels = rng.integers(0, C, size=n).astype(np.int32)
        W_cs, _ = train_crammer_singer(idx, val, labels, C, d, 1.0, 1e-4,
                                       max_iter=4000)
        W_ovr, _ = train_one_vs_rest(idx, val, labels, C, d, 1.0, 1e-4,
                                     solver=2, max_iter=4000)
        assert not np.allclose(W_cs, W_ovr, atol=1e-2)

    @pytest.mark.parametrize("solver", [5, 6])
    def test_l1_matches_scipy_objective(self, solver):
        """L1-regularized enums (5 = L1R_L2LOSS_SVC, 6 = L1R_LR;
        trainer.rs:22-80). The nondifferentiable |w|_1 term is handled in
        the independent reference via p-q variable splitting (w = p - q,
        p,q >= 0, |w|_1 <= sum(p+q)) so box-constrained L-BFGS-B solves
        the SAME objective the FISTA prox path optimizes."""
        from scipy.optimize import minimize

        from vaporetto_tpu.train.solver import (
            LOGISTIC,
            solver_loss_kind,
            train_binary,
        )

        idx, val, y, d = self._problem()
        cost = 1.0
        w, b = train_binary(idx, val, y, d, cost, 0.0001, solver,
                            max_iter=6000)
        w_full = np.concatenate([w, [b]])
        kind = solver_loss_kind(solver)

        def np_loss(m):
            if kind == LOGISTIC:
                return np.logaddexp(0.0, -m)
            return np.square(np.maximum(0.0, 1.0 - m))

        def np_dloss(m):
            if kind == LOGISTIC:
                return -1.0 / (1.0 + np.exp(m))
            return -2.0 * np.maximum(0.0, 1.0 - m)

        def margins(wf):
            return np.array([
                wf[idx[i] - 1].sum() for i in range(len(y))
            ])

        def objective(wf):
            return np.abs(wf).sum() + cost * np_loss(y * margins(wf)).sum()

        ours = objective(w_full)
        D = d + 1

        def split_obj(pq):
            wf = pq[:D] - pq[D:]
            m = y * margins(wf)
            f = pq.sum() + cost * np_loss(m).sum()
            dl = cost * np_dloss(m) * y
            gw = np.zeros(D)
            for i in range(len(y)):
                np.add.at(gw, idx[i] - 1, dl[i])
            return f, np.concatenate([1.0 + gw, 1.0 - gw])

        res = minimize(split_obj, np.zeros(2 * D), jac=True,
                       method="L-BFGS-B", bounds=[(0, None)] * (2 * D),
                       options={"maxiter": 3000})
        assert ours <= res.fun * 1.01 + 1e-3, (
            f"solver {solver}: ours {ours} vs scipy {res.fun}"
        )
