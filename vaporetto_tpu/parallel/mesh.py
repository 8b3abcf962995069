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

    Model tables are passed as replicated device arguments (never baked as
    jit constants — see predictor._build_predict_fn); inputs/outputs are
    sharded on the batch dimension. Batch size must be divisible by mesh
    size.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    traced, tables = predictor.predict_traced_fn()
    batch_sharding = NamedSharding(mesh, P(axis, None))
    vec_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    table_shardings = jax.tree.map(lambda _: rep, tables)
    jitted = jax.jit(
        traced,
        in_shardings=(batch_sharding, batch_sharding, vec_sharding,
                      table_shardings),
        out_shardings=None,
    )
    tables_rep = jax.device_put(tables, table_shardings)

    def fn(cps, cts, lengths):
        return jitted(cps, cts, lengths, tables_rep)

    return fn


def train_step_dryrun(mesh, axis: str = "dp") -> None:
    """The REAL trainer solver, data-parallel over the mesh, tiny shapes.

    Runs the FISTA solver from train/solver.py (the LIBLINEAR replacement
    used by the actual ``Trainer``) with the sparse example arrays sharded
    on the batch dimension and the weight vector replicated; GSPMD inserts
    the cross-device reduction for the `segment_sum` gradient — the exact
    collective layout of multi-host training.
    """
    from ..train.solver import train_binary

    n = mesh.devices.size
    N, K, D = 8 * n, 8, 30
    rng = np.random.default_rng(0)
    idx = rng.integers(1, D + 1, size=(N, K)).astype(np.int32)
    val = np.ones((N, K), dtype=np.float32)
    y = np.where(rng.random(N) > 0.5, 1.0, -1.0).astype(np.float32)

    # the user-reachable sharded path (train CLI --dp): example matrix
    # sharded on the dp axis, GSPMD-reduced gradients
    w, bias = train_binary(idx, val, y, D, 1.0, 0.01, 0, max_iter=25,
                           mesh=mesh)
    assert w.shape == (D,)
