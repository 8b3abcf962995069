"""Device-mesh data parallelism.

The reference is single-threaded CPU (SURVEY.md §2.4); scale-out here is
TPU-native from the start: a 1-D ``dp`` mesh, corpus batches sharded over
it, model tables replicated, XLA inserting the collectives. The weight
tables are MBs, so replication is the right layout (tensor/pipeline/expert
parallelism would add communication for no win — documented out of scope).

Training uses the same mesh with `psum`-reduced gradients (the trainer's
feature-count/gradient aggregation path).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def make_mesh(n_devices: int | None = None, axis: str = "dp"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_predict_fn(predictor, mesh, axis: str = "dp"):
    """Jit the predictor's batch function with batch sharded over the mesh.

    Model tables are closed over (replicated); inputs/outputs are sharded on
    the batch dimension. Batch size must be divisible by mesh size.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = predictor.predict_raw_fn()
    batch_sharding = NamedSharding(mesh, P(axis, None))
    vec_sharding = NamedSharding(mesh, P(axis))
    return jax.jit(
        fn,
        in_shardings=(batch_sharding, batch_sharding, vec_sharding),
        out_shardings=None,
    )


def train_step_dryrun(mesh, axis: str = "dp") -> None:
    """One data-parallel training step on tiny shapes.

    A full-batch L2-regularized logistic-regression step (the solver family
    the trainer uses — reference trainer.rs:352-364 delegates to LIBLINEAR)
    with examples sharded over the mesh and the gradient reduced by `psum`
    across it. Exercises the exact collective layout of the real trainer.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    N, D = 8 * n, 32
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, D)).astype(np.float32)
    y = (rng.random(N) > 0.5).astype(np.float32)
    w0 = np.zeros(D, dtype=np.float32)

    data_sharding = NamedSharding(mesh, P(axis, None))
    vec_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def loss_fn(w, xb, yb):
        logits = xb @ w
        ll = jnp.mean(
            jnp.logaddexp(0.0, logits) - yb * logits
        )
        return ll + 0.5 * 1e-2 * jnp.sum(w * w)

    @jax.jit
    def step(w, xb, yb):
        g = jax.grad(loss_fn)(w, xb, yb)
        return w - 0.1 * g

    xs = jax.device_put(x, data_sharding)
    ys = jax.device_put(y, vec_sharding)
    ws = jax.device_put(w0, rep)
    w1 = step(ws, xs, ys)
    jax.block_until_ready(w1)
