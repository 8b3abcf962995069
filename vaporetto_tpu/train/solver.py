"""JAX linear-classifier solver — the LIBLINEAR replacement.

The reference trains with the C++ LIBLINEAR library via FFI
(trainer.rs:352-364, tag_trainer.rs:182-194). Exact solver parity is not a
goal (SURVEY.md §7 "hard parts"); objective parity is: we minimize the same
LIBLINEAR objectives

    L2 reg:  0.5 * w.w + C * sum_i loss(y_i * w.x_i)
    L1 reg:  |w|_1    + C * sum_i loss(y_i * w.x_i)

with loss = logistic / squared hinge / hinge depending on the solver enum,
bias handled LIBLINEAR-style as an appended constant feature (regularized).

Optimization is FISTA (proximal accelerated gradient) — fully batched,
TPU-friendly: each iteration is one sparse matvec (gather + segment-sum),
and examples can be sharded across a device mesh with `psum` gradient
reduction (the multi-host trainer path).

Sparse examples are padded (N, K) arrays of feature ids/values; id 0 is
reserved for padding, real features are 1..=D, the bias feature is D+1.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["train_binary", "train_one_vs_rest", "train_crammer_singer",
           "train_boundary", "LOGISTIC", "L2_HINGE", "L1_HINGE",
           "solver_loss_kind", "solver_is_l1"]

LOGISTIC = 0
L2_HINGE = 1
L1_HINGE = 2

#: Nesterov smoothing width for the (non-smooth) hinge loss: the smoothed
#: loss is within MU/2 of the true hinge everywhere and has a 1/MU-
#: Lipschitz gradient, so FISTA converges at its accelerated rate (the
#: plain subgradient has no such guarantee).
HINGE_SMOOTHING_MU = 0.01


def solver_loss_kind(solver: int) -> int:
    """Map the reference SolverType enum (trainer.rs:22-80) to a loss.

    LIBLINEAR's dual solvers optimize the SAME primal objective as their
    primal counterparts (dual ascent is an algorithmic choice, not a
    different model), so the dual->primal mapping here is exact on the
    objective:

    | enum | LIBLINEAR solver        | objective solved here            |
    |------|-------------------------|----------------------------------|
    | 0    | L2R_LR (primal)         | L2 reg + logistic                |
    | 1    | L2R_L2LOSS_SVC_DUAL     | L2 reg + squared hinge (= 2)     |
    | 2    | L2R_L2LOSS_SVC (primal) | L2 reg + squared hinge           |
    | 3    | L2R_L1LOSS_SVC_DUAL     | L2 reg + hinge (Nesterov-        |
    |      |                         | smoothed by MU for FISTA)        |
    | 4    | MCSVM_CS (Crammer-      | joint CS objective — see         |
    |      | Singer multiclass)      | :func:`train_crammer_singer`     |
    | 5    | L1R_L2LOSS_SVC          | L1 reg + squared hinge           |
    | 6    | L1R_LR                  | L1 reg + logistic                |
    | 7    | L2R_LR_DUAL             | L2 reg + logistic (= 0)          |
    """
    if solver in (0, 6, 7):
        return LOGISTIC
    if solver in (1, 2, 5):
        return L2_HINGE
    if solver == 3:
        return L1_HINGE
    if solver == 4:
        raise ValueError(
            "enum 4 (MCSVM_CS) has no binary loss; it routes through "
            "train_crammer_singer"
        )
    raise ValueError("Unsupported solver type.")


def solver_is_l1(solver: int) -> bool:
    return solver in (5, 6)


def _losses(kind):
    if kind == LOGISTIC:

        def loss(m):  # m = y * w.x
            return jnp.logaddexp(0.0, -m)

        def dloss(m):  # d loss / d m = -sigmoid(-m)
            return -jax.nn.sigmoid(-m)

    elif kind == L2_HINGE:

        def loss(m):
            return jnp.square(jnp.maximum(0.0, 1.0 - m))

        def dloss(m):
            return -2.0 * jnp.maximum(0.0, 1.0 - m)

    else:  # L1_HINGE — Nesterov-smoothed hinge (see HINGE_SMOOTHING_MU):
        # 0 for z <= 0, z^2/(2 mu) for 0 < z < mu, z - mu/2 beyond,
        # with z = 1 - m. Gradient is 1/mu-Lipschitz.
        mu = HINGE_SMOOTHING_MU

        def loss(m):
            z = 1.0 - m
            return jnp.where(
                z <= 0.0,
                0.0,
                jnp.where(z >= mu, z - 0.5 * mu, z * z / (2.0 * mu)),
            )

        def dloss(m):
            return -jnp.clip((1.0 - m) / mu, 0.0, 1.0)

    return loss, dloss


#: iterations per device dispatch. The solve used to run power
#: iteration + the full while_loop as ONE device execution; on the
#: axon tunnel single executions beyond ~60 s crash the TPU worker
#: (PERF.md "axon-tunnel measurement traps"), and an unbounded loop
#: gives no progress signal anywhere. Chunking keeps each dispatch
#: bounded with the state device-resident between chunks — on healthy
#: hardware the per-chunk dispatch cost is amortized over
#: SOLVER_CHUNK iterations (sub-percent overhead).
import os as _os

SOLVER_CHUNK = int(_os.environ.get("VAPORETTO_TPU_SOLVER_CHUNK", "32"))
#: per-dispatch work budget in gathered nnz (iterations x N x K): big
#: problems shrink the chunk so one dispatch stays bounded (a 100k-line
#: corpus at 32 iterations/chunk still crashed the tunnel worker)
SOLVER_CHUNK_NNZ = float(
    _os.environ.get("VAPORETTO_TPU_SOLVER_CHUNK_NNZ", "2e8")
)


def _auto_chunk(nnz: int) -> int:
    return max(2, min(SOLVER_CHUNK, int(SOLVER_CHUNK_NNZ // max(nnz, 1))))


def _progress(it: int, max_iter: int, delta: float) -> None:
    """Optional per-chunk progress line (VAPORETTO_TPU_SOLVER_PROGRESS=1)
    — the host-driven chunk loop makes a live signal possible at all;
    LIBLINEAR prints optimization progress the same way (stderr)."""
    if _os.environ.get("VAPORETTO_TPU_SOLVER_PROGRESS") == "1":
        import sys
        import time

        print(f"[solver] iter {it}/{max_iter} delta {delta:.3e} "
              f"t={time.strftime('%H:%M:%S')}",
              file=sys.stderr, flush=True)


def _binary_ops(idx, val, y, sample_mask, n_dim, cost, loss_kind, l1):
    loss_fn, dloss_fn = _losses(loss_kind)

    def matvec(w):
        return jnp.sum(w[idx] * val, axis=1)

    def rmatvec(r):
        # X^T r via segment-sum over flattened ids
        contrib = (val * r[:, None]).reshape(-1)
        return jax.ops.segment_sum(contrib, idx.reshape(-1),
                                   num_segments=n_dim)

    def f_grad(w):
        m = y * matvec(w)
        dl = dloss_fn(m) * y * sample_mask
        g = cost * rmatvec(dl)
        f = cost * jnp.sum(loss_fn(m) * sample_mask)
        if not l1:
            g = g + w
            f = f + 0.5 * jnp.sum(w * w)
        # padding slot 0 carries no real feature
        g = g.at[0].set(0.0)
        return f, g

    return matvec, rmatvec, f_grad


@functools.partial(jax.jit, static_argnames=("n_dim", "n_steps"))
def _fista_power(idx, val, n_dim, n_steps, v):
    """``n_steps`` power iterations on X^T X (Lipschitz estimate),
    chunkable; returns (v, sigma2_of_v)."""
    def matvec(w):
        return jnp.sum(w[idx] * val, axis=1)

    def rmatvec(r):
        contrib = (val * r[:, None]).reshape(-1)
        return jax.ops.segment_sum(contrib, idx.reshape(-1),
                                   num_segments=n_dim)

    def power_body(_, v):
        v = rmatvec(matvec(v))
        return v / (jnp.linalg.norm(v) + 1e-30)

    v = jax.lax.fori_loop(0, n_steps, power_body, v)
    sigma2 = jnp.linalg.norm(rmatvec(matvec(v)))
    return v, sigma2


@functools.partial(
    jax.jit,
    static_argnames=("n_dim", "loss_kind", "l1", "max_iter", "chunk"),
)
def _fista_advance(
    idx, val, y, sample_mask, n_dim, cost, eps, loss_kind, l1,
    max_iter, chunk, step, state,
):
    """Advance the FISTA while_loop by at most ``chunk`` iterations
    (same body/cond as the monolithic loop — chunk boundaries only
    pause it)."""
    _, _, f_grad = _binary_ops(
        idx, val, y, sample_mask, n_dim, cost, loss_kind, l1
    )

    def prox(w, s):
        if l1:
            w = jnp.sign(w) * jnp.maximum(jnp.abs(w) - s, 0.0)
        return w

    def body(state):
        w, z, t, _, it = state
        _, g = f_grad(z)
        w_new = prox(z - step * g, step)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = w_new + ((t - 1.0) / t_new) * (w_new - w)
        delta = jnp.max(jnp.abs(w_new - w))
        return w_new, z_new, t_new, delta, it + 1

    limit = state[4] + chunk

    def cond(state):
        _, _, _, delta, it = state
        return (
            (it < limit) & (it < max_iter)
            & ((it < 8) | (delta > eps * step * 100.0))
        )

    return jax.lax.while_loop(cond, body, state)


def _fista(
    idx: jax.Array,  # (N, K) int32 feature ids (0 = pad)
    val: jax.Array,  # (N, K) float32 values
    y: jax.Array,  # (N,) float32 in {+1, -1}
    sample_mask: jax.Array,  # (N,) float32 1.0 for real rows
    n_dim: int,  # D + 2 (0 pad slot + D features + bias)
    cost: float,
    eps: float,
    loss_kind: int,
    l1: bool,
    max_iter: int,
) -> jax.Array:
    chunk = _auto_chunk(idx.size)
    psteps = max(1, min(4, chunk // 2))
    v = jnp.ones((n_dim,), dtype=jnp.float32) / np.sqrt(n_dim)
    done = 0
    while done < 16:  # 16 power iterations in bounded dispatches
        v, sigma2 = _fista_power(idx, val, n_dim, psteps, v)
        done += psteps
    # loss-curvature bound: logistic <= 1/4 (we use 1 for safety),
    # squared hinge = 2, smoothed hinge = 1/mu
    if loss_kind == L2_HINGE:
        curvature = 2.0
    elif loss_kind == L1_HINGE:
        curvature = 1.0 / HINGE_SMOOTHING_MU
    else:
        curvature = 1.0
    lip = float(sigma2) * cost * curvature + (0.0 if l1 else 1.0) + 1e-6
    step = np.float32(1.0 / lip)

    w0 = jnp.zeros((n_dim,), dtype=jnp.float32)
    state = (w0, w0, jnp.float32(1.0), jnp.float32(jnp.inf), jnp.int32(0))
    eps32 = np.float32(eps)
    while True:
        state = _fista_advance(
            idx, val, y, sample_mask, n_dim, cost, eps32, loss_kind, l1,
            max_iter, chunk, step, state,
        )
        it = int(state[4])
        delta = float(state[3])
        _progress(it, max_iter, delta)
        # host twin of the device cond (same float32 quantities)
        if it >= max_iter or (
            it >= 8 and not delta > float(eps32 * step * np.float32(100.0))
        ):
            return state[0]


#: Nesterov smoothing width for the Crammer-Singer max term: the
#: log-sum-exp smoothed max overestimates the true max by at most
#: MU * ln(n_classes) per example and has a (1/MU)-Lipschitz gradient.
CS_SMOOTHING_MU = 0.01


@functools.partial(
    jax.jit,
    static_argnames=("n_dim", "n_classes", "max_iter", "chunk"),
)
def _fista_cs_advance(
    idx, val, labels, sample_mask, n_dim, n_classes, cost, eps,
    max_iter, chunk, step, state,
):
    """Advance the Crammer-Singer FISTA loop by at most ``chunk``
    iterations (see :func:`_fista_cs`)."""
    mu = CS_SMOOTHING_MU
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)

    def matvec(W):  # (C, n_dim) -> (N, C) margins
        return jnp.einsum("nkc,nk->nc", W.T[idx], val)

    def rmatvec(R):  # (N, C) -> (C, n_dim)
        contrib = (val[:, :, None] * R[:, None, :]).reshape(-1, n_classes)
        return jax.ops.segment_sum(
            contrib, idx.reshape(-1), num_segments=n_dim
        ).T

    def f_grad(W):
        m = matvec(W)  # (N, C)
        s = (m + (1.0 - onehot)) / mu
        # smoothed loss: mu * LSE(s) - m[y]; gradient wrt m: softmax - 1_y
        lse = jax.scipy.special.logsumexp(s, axis=1)
        f_loss = mu * lse - jnp.sum(m * onehot, axis=1)
        p = jax.nn.softmax(s, axis=1)
        dm = (p - onehot) * sample_mask[:, None]
        g = cost * rmatvec(dm) + W
        f = cost * jnp.sum(f_loss * sample_mask) + 0.5 * jnp.sum(W * W)
        g = g.at[:, 0].set(0.0)  # padding slot carries no real feature
        return f, g

    def body(state):
        W, Z, t, _, it = state
        _, g = f_grad(Z)
        W_new = Z - step * g
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        Z_new = W_new + ((t - 1.0) / t_new) * (W_new - W)
        delta = jnp.max(jnp.abs(W_new - W))
        return W_new, Z_new, t_new, delta, it + 1

    limit = state[4] + chunk

    def cond(state):
        _, _, _, delta, it = state
        return (
            (it < limit) & (it < max_iter)
            & ((it < 8) | (delta > eps * step * 100.0))
        )

    return jax.lax.while_loop(cond, body, state)


def _fista_cs(
    idx: jax.Array,  # (N, K) int32 feature ids (0 = pad)
    val: jax.Array,  # (N, K) float32 values
    labels: jax.Array,  # (N,) int32 class ids 0..C-1
    sample_mask: jax.Array,  # (N,) float32 1.0 for real rows
    n_dim: int,
    n_classes: int,
    cost: float,
    eps: float,
    max_iter: int,
) -> jax.Array:
    """FISTA on the Nesterov-smoothed Crammer-Singer primal.

    Objective (LIBLINEAR MCSVM_CS; Crammer & Singer 2001, the solver the
    reference selects with enum 4, trainer.rs:22-47):

        min_W  0.5 * sum_r ||w_r||^2
               + C * sum_i [ max_r (w_r.x_i + e_i^r) - w_{y_i}.x_i ]

    with e_i^r = 0 if r == y_i else 1 (so the bracket is the multiclass
    hinge, >= 0). The non-smooth max is smoothed as
    MU * logsumexp(s / MU) — the same Nesterov device as the binary hinge
    (enum 3) — giving softmax gradients and FISTA's accelerated rate.
    Runs in SOLVER_CHUNK-iteration device dispatches (see the chunking
    note above :data:`SOLVER_CHUNK`).
    """
    mu = CS_SMOOTHING_MU
    chunk = _auto_chunk(idx.size * max(n_classes // 2, 1))
    psteps = max(1, min(4, chunk // 2))
    v = jnp.ones((n_dim,), dtype=jnp.float32) / np.sqrt(n_dim)
    done = 0
    while done < 16:
        v, sigma2 = _fista_power(idx, val, n_dim, psteps, v)
        done += psteps
    # Lipschitz: ||X||^2 * (softmax curvature 1/mu) * C + 1 (regularizer)
    lip = cost * float(sigma2) / mu + 1.0 + 1e-6
    step = np.float32(1.0 / lip)

    W0 = jnp.zeros((n_classes, n_dim), dtype=jnp.float32)
    state = (W0, W0, jnp.float32(1.0), jnp.float32(jnp.inf), jnp.int32(0))
    eps32 = np.float32(eps)
    while True:
        state = _fista_cs_advance(
            idx, val, labels, sample_mask, n_dim, n_classes, cost, eps32,
            max_iter, chunk, step, state,
        )
        it = int(state[4])
        delta = float(state[3])
        _progress(it, max_iter, delta)
        if it >= max_iter or (
            it >= 8 and not delta > float(eps32 * step * np.float32(100.0))
        ):
            return state[0]


def train_crammer_singer(
    idx: np.ndarray,
    val: np.ndarray,
    labels: np.ndarray,  # (N,) int class ids 0..C-1
    n_classes: int,
    n_features: int,
    cost: float,
    eps: float,
    max_iter: int = 2000,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Joint Crammer-Singer multiclass training (LIBLINEAR MCSVM_CS,
    solver enum 4); returns (W[C, D], biases[C]).

    Unlike :func:`train_one_vs_rest` the C weight vectors are coupled
    through the shared max term — the faithful counterpart of the
    reference's enum 4 (trainer.rs:22-47), not an OVR substitution. The
    bias rides as the appended constant feature D+1, exactly as LIBLINEAR
    applies its ``bias(1.0)`` problem setting to every solver.
    """
    n_dim = max(16, 1 << (n_features + 1).bit_length())
    n = len(labels)
    n_pad = max(8, 1 << (n - 1).bit_length())
    k_pad = max(8, 1 << (idx.shape[1] - 1).bit_length())
    if mesh is not None:
        ndev = int(np.prod(mesh.devices.shape))
        n_pad = ((n_pad + ndev - 1) // ndev) * ndev
    idx_p = np.zeros((n_pad, k_pad), dtype=np.int32)
    val_p = np.zeros((n_pad, k_pad), dtype=np.float32)
    idx_p[:n, : idx.shape[1]] = idx
    val_p[:n, : idx.shape[1]] = val
    y_p = np.zeros(n_pad, dtype=np.int32)
    y_p[:n] = labels
    mask = np.zeros(n_pad, dtype=np.float32)
    mask[:n] = 1.0
    if mesh is not None:
        idx_p, val_p, y_p, mask = _shard_examples(mesh, idx_p, val_p, y_p,
                                                  mask)
    with _use_mesh(mesh):
        W = _fista_cs(
            jnp.asarray(idx_p), jnp.asarray(val_p), jnp.asarray(y_p),
            jnp.asarray(mask), n_dim, int(n_classes), float(cost),
            float(eps), max_iter,
        )
    W = np.asarray(W, dtype=np.float64)
    return W[:, 1 : n_features + 1], W[:, n_features + 1].copy()


def train_boundary(
    idx: np.ndarray,
    val: np.ndarray,
    ys: np.ndarray,  # (N,) raw CharacterBoundary labels (0/1/2)
    n_features: int,
    cost: float,
    eps: float,
    solver: int,
    max_iter: int = 2000,
    mesh=None,
) -> Tuple[np.ndarray, float]:
    """The boundary trainer's solve: the WordBoundary weight column.

    Mirrors the reference's extraction (trainer.rs:366-397:
    ``feature_coefficient(fid, wb_idx)``): binary solvers collapse to
    WordBoundary-vs-rest (LIBLINEAR's internal OVR over the label set,
    which may include Unknown = 2 from partial annotation); enum 4 solves
    the JOINT Crammer-Singer problem over all present labels and returns
    the WordBoundary class's row.
    """
    if solver == 4:
        uniq = np.unique(np.asarray(ys))
        wb_pos = np.flatnonzero(uniq == 1)
        if len(wb_pos) == 0:
            raise ValueError("no WordBoundary examples")
        labels = np.searchsorted(uniq, np.asarray(ys)).astype(np.int32)
        W, b = train_crammer_singer(
            idx, val, labels, len(uniq), n_features, cost, eps,
            max_iter, mesh=mesh,
        )
        wb = int(wb_pos[0])
        return W[wb], float(b[wb])
    y_pm = np.where(np.asarray(ys) == 1, 1.0, -1.0)
    return train_binary(idx, val, y_pm, n_features, cost, eps, solver,
                        max_iter, mesh=mesh)


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _shard_examples(mesh, idx_p, val_p, y_p, mask):
    """Place the padded example arrays sharded on the mesh's ``dp`` axis
    (weights stay replicated); GSPMD inserts the cross-device reduction
    for the ``segment_sum`` gradient — the multi-host trainer collective
    layout (SURVEY.md §2.4)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P("dp", None))
    vec = NamedSharding(mesh, P("dp"))
    return (
        jax.device_put(idx_p, data),
        jax.device_put(val_p, data),
        jax.device_put(y_p, vec),
        jax.device_put(mask, vec),
    )


def _use_mesh(mesh):
    import jax

    if mesh is not None and hasattr(jax.sharding, "use_mesh"):
        return jax.sharding.use_mesh(mesh)
    return _null_ctx()


def train_binary(
    idx: np.ndarray,
    val: np.ndarray,
    y_pm: np.ndarray,  # (N,) +1/-1
    n_features: int,  # D (real features are ids 1..=D; bias id D+1)
    cost: float,
    eps: float,
    solver: int,
    max_iter: int = 2000,
    mesh=None,
) -> Tuple[np.ndarray, float]:
    """Train one binary classifier; returns (weights[1..=D], bias).

    With ``mesh`` (a ``jax.sharding.Mesh`` with a ``dp`` axis), the example
    arrays are sharded over the mesh's devices and the FISTA solve runs
    data-parallel — the TPU-native analogue of LIBLINEAR multi-core, and
    the multi-host training path.

    Enum 4 (MCSVM_CS) routes through the joint 2-class Crammer-Singer
    solve and returns the +1 class's row (at the CS optimum the two rows
    are exact negations by symmetry).
    """
    if solver == 4:
        labels = np.where(np.asarray(y_pm) > 0, 0, 1).astype(np.int32)
        W, b = train_crammer_singer(idx, val, labels, 2, n_features,
                                    cost, eps, max_iter, mesh=mesh)
        return W[0], float(b[0])
    loss_kind = solver_loss_kind(solver)
    l1 = solver_is_l1(solver)
    # n_dim is also padded to a power of two (unused slots stay zero)
    n_dim = max(16, 1 << (n_features + 1).bit_length())
    # pad shapes to powers of two so repeated solver calls (e.g. per-token
    # tag models) reuse compiled executables
    n = len(y_pm)
    n_pad = max(8, 1 << (n - 1).bit_length())
    k_pad = max(8, 1 << (idx.shape[1] - 1).bit_length())
    if mesh is not None:
        # example rows must divide evenly over the data-parallel axis
        ndev = int(np.prod(mesh.devices.shape))
        n_pad = ((n_pad + ndev - 1) // ndev) * ndev
    idx_p = np.zeros((n_pad, k_pad), dtype=np.int32)
    val_p = np.zeros((n_pad, k_pad), dtype=np.float32)
    idx_p[:n, : idx.shape[1]] = idx
    val_p[:n, : idx.shape[1]] = val
    y_p = np.ones(n_pad, dtype=np.float32)
    y_p[:n] = y_pm
    mask = np.zeros(n_pad, dtype=np.float32)
    mask[:n] = 1.0
    if mesh is not None:
        idx_p, val_p, y_p, mask = _shard_examples(mesh, idx_p, val_p, y_p, mask)
    with _use_mesh(mesh):
        w = _do_fista(idx_p, val_p, y_p, mask, n_dim, cost, eps, loss_kind,
                      l1, max_iter)
    w = np.asarray(w, dtype=np.float64)
    return w[1 : n_features + 1], float(w[n_features + 1])


def _do_fista(idx_p, val_p, y_p, mask, n_dim, cost, eps, loss_kind, l1,
              max_iter):
    return _fista(
        jnp.asarray(idx_p),
        jnp.asarray(val_p),
        jnp.asarray(y_p),
        jnp.asarray(mask),
        n_dim,
        float(cost),
        float(eps),
        loss_kind,
        l1,
        max_iter,
    )


def train_one_vs_rest(
    idx: np.ndarray,
    val: np.ndarray,
    labels: np.ndarray,  # (N,) int class ids 0..C-1
    n_classes: int,
    n_features: int,
    cost: float,
    eps: float,
    solver: int,
    max_iter: int = 2000,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-vs-rest training; returns (W[C, D], biases[C]).

    Matches LIBLINEAR's multiclass strategy for its binary solvers. For
    exactly two classes the two rows are exact negations, as in LIBLINEAR's
    single-model binary case. Enum 4 (MCSVM_CS) instead solves the JOINT
    Crammer-Singer objective (:func:`train_crammer_singer`), matching
    LIBLINEAR's one true multiclass solver.
    """
    if solver == 4:
        return train_crammer_singer(
            idx, val, np.asarray(labels, dtype=np.int32), n_classes,
            n_features, cost, eps, max_iter, mesh=mesh,
        )
    W = np.zeros((n_classes, n_features), dtype=np.float64)
    biases = np.zeros(n_classes, dtype=np.float64)
    if n_classes == 2:
        y_pm = np.where(labels == 0, 1.0, -1.0)
        w, b = train_binary(idx, val, y_pm, n_features, cost, eps, solver,
                            max_iter, mesh=mesh)
        W[0], biases[0] = w, b
        W[1], biases[1] = -w, -b
        return W, biases
    for c in range(n_classes):
        y_pm = np.where(labels == c, 1.0, -1.0)
        W[c], biases[c] = train_binary(
            idx, val, y_pm, n_features, cost, eps, solver, max_iter,
            mesh=mesh
        )
    return W, biases
