"""Automatic engine routing: device (jitted XLA pipeline) vs host
(native C++ evaluator).

The reference ships ONE engine that is always its fastest
(predict/src/main.rs); this framework has two, whose relative speed
depends on the attached accelerator:

* healthy TPU, bulk corpora  -> device (the HBM-streaming pipeline's
  analytic floor is orders of magnitude above one CPU core)
* no accelerator (CPU-only JAX) -> host (the native evaluator beats the
  XLA-CPU emulation of the same pipeline severalfold)
* dispatch-degraded device (e.g. a remote tunnel with ~16 ms
  synchronous dispatch, PERF.md "axon-tunnel measurement traps") -> host

``--backend auto`` (the CLI default) applies this policy with a
time-boxed probe: one tiny jitted computation is dispatched and read
back on a side thread. A healthy accelerator completes it in well under
a second and round-trips a 4-byte readback in <~1 ms; a degraded tunnel
either wedges (timeout -> host) or shows a multi-ms synchronous
dispatch (threshold -> host). The probe costs nothing on CPU (no thread
is spawned) and its verdict is cached per process.

Overrides: ``VAPORETTO_TPU_BACKEND=device|host`` skips the probe.
"""

from __future__ import annotations

import os
import time
from typing import Optional

__all__ = ["resolve_backend", "device_dispatch_ok"]

#: a post-warmup dispatch+readback round trip slower than this marks the
#: device as dispatch-degraded (healthy PCIe/ICI attachments are <1 ms;
#: the axon tunnel's synchronous mode measures ~16 ms)
DISPATCH_THRESHOLD_S = 0.004
#: how long the probe may take end to end (compile of a trivial program
#: + first readback); a healthy backend finishes in <1 s
PROBE_TIMEOUT_S = 15.0

_probe_cache: Optional[bool] = None


def device_dispatch_ok(timeout_s: Optional[float] = None) -> bool:
    """True when the attached accelerator completes a tiny dispatch +
    readback promptly (see module docstring); cached per process."""
    global _probe_cache
    if _probe_cache is not None:
        return _probe_cache
    timeout_s = PROBE_TIMEOUT_S if timeout_s is None else timeout_s
    import threading

    holder = {}

    def probe():
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            f = jax.jit(lambda a: a + 1)
            x = jnp.arange(8, dtype=jnp.int32)
            np.asarray(f(x)[0])  # compile + first readback
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(x)[0])
                ts.append(time.perf_counter() - t0)
            holder["rt"] = sorted(ts)[1]
        except Exception:
            holder["rt"] = float("inf")

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    rt = holder.get("rt")  # None = probe still wedged
    _probe_cache = rt is not None and rt < DISPATCH_THRESHOLD_S
    return _probe_cache


def resolve_backend(requested: str, native_available: bool,
                    need_device: bool = False) -> str:
    """Resolve a requested backend ("device" | "host" | "auto").

    ``native_available``: whether the C++ host engine can serve this
    model. ``need_device``: the caller needs device execution regardless
    (e.g. ``--dp`` mesh sharding).
    """
    if requested in ("device", "host"):
        return requested
    if requested != "auto":
        raise ValueError(f"unknown backend {requested!r}")
    forced = os.environ.get("VAPORETTO_TPU_BACKEND")
    if forced in ("device", "host"):
        return forced
    if need_device or not native_available:
        return "device"
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return "host"
    if platform == "cpu":
        # no accelerator: the native evaluator beats XLA-CPU emulation
        return "host"
    return "device" if device_dispatch_ok() else "host"
