"""Multi-host initialization and collectives layout.

The reference has no distributed runtime (SURVEY.md §2.4); this module is
the TPU-native scale-out entry point:

* ``initialize()`` wraps ``jax.distributed.initialize`` (controller-less,
  TPU pods discover peers from the environment; explicit
  coordinator/num_processes/process_id for CPU/GPU clusters).
* Layout: one global 1-D ``dp`` mesh over all chips of all hosts. Model
  tables are replicated (MBs — broadcast once at startup); corpus batches
  are sharded per host by ``parallel.data.host_shard`` so input IO never
  crosses hosts; boundary outputs stay host-local. The only cross-host
  traffic is training's `psum` gradient reduction (rides ICI within a
  slice, DCN across slices) and evaluation metric all-reduce.
* Failure handling: standard JAX multi-host semantics — a lost process
  aborts the job; re-run resumes from the model artifact (training is
  one-shot in-memory, matching the reference's checkpoint story,
  SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional

__all__ = ["initialize", "global_mesh", "metric_allreduce"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.

    With explicit arguments (or a distributed environment detected via
    ``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``), a failure RAISES
    — a misconfigured pod must not silently degrade to single-process
    (reference fail-loudly philosophy, errors.rs). With no configuration
    at all, auto-discovery failure means "not a pod" and single-process is
    the correct result.
    """
    import os

    import jax

    if num_processes is None and coordinator_address is None:
        # TPU pods self-discover; elsewhere single-process
        try:
            jax.distributed.initialize()
        except Exception:
            if (os.environ.get("JAX_COORDINATOR_ADDRESS")
                    or os.environ.get("COORDINATOR_ADDRESS")):
                raise
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "dp"):
    """A 1-D mesh over every chip of every host."""
    from .mesh import make_mesh

    return make_mesh(None, axis)


def metric_allreduce(counts):
    """Sum evaluation counts (tp/tn/fp/fn, word counts) across hosts.

    Accepts a dict of ints; returns the globally summed dict. Uses a tiny
    jitted psum over the global mesh; single-process it is the identity.
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return dict(counts)
    from jax.experimental import multihost_utils

    keys = sorted(counts)
    local = np.array([counts[k] for k in keys], dtype=np.int64)
    total = multihost_utils.process_allgather(local).sum(axis=0)
    return {k: int(v) for k, v in zip(keys, total)}
