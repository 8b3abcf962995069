"""Automatic engine routing: device (jitted XLA pipeline) vs host
(native C++ evaluator).

The reference ships ONE engine that is always its fastest
(predict/src/main.rs); this framework has two, whose relative speed
depends on the attached accelerator:

* healthy TPU, bulk corpora  -> device (the HBM-streaming pipeline's
  analytic floor is orders of magnitude above one CPU core)
* healthy TPU, tiny/interactive input -> host (compile + per-dispatch
  latency alone exceed the whole host evaluation of a few lines)
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

The bulk term: callers pass ``bulk_hint`` = a cheap upper bound on the
input size in chars (the predict CLI stats seekable stdin and passes
its byte size; a TTY passes 0; an unseekable pipe passes None =
unknown). On a HEALTHY device, hints below ``bulk_threshold_chars``
route to host — the reference ships one engine that is always its
fastest (predict/src/main.rs), and for a 3-line interactive run that
engine is never the one paying jit compiles and dispatch round trips.
Unknown sizes are assumed bulk (the device is the design target).

Overrides / tuning (environment):

* ``VAPORETTO_TPU_BACKEND=device|host`` skips the probe entirely.
* ``VAPORETTO_TPU_DISPATCH_THRESHOLD_MS`` (default 4.0): round trips
  slower than this mark the device dispatch-degraded.
* ``VAPORETTO_TPU_BULK_CHARS`` (default 1000000): bulk-term cutoff.
* ``VAPORETTO_TPU_REPROBE=1``: ignore the cached probe verdict once
  (long-lived processes re-checking a recovered device).
"""

from __future__ import annotations

import os
import time
from typing import Optional

__all__ = ["resolve_backend", "device_dispatch_ok"]

#: a post-warmup dispatch+readback round trip slower than this marks the
#: device as dispatch-degraded (healthy PCIe/ICI attachments are <1 ms;
#: the axon tunnel's synchronous mode measures ~16 ms);
#: VAPORETTO_TPU_DISPATCH_THRESHOLD_MS overrides
DISPATCH_THRESHOLD_S = 0.004
#: how long the probe may take end to end (compile of a trivial program
#: + first readback); a healthy backend finishes in <1 s
PROBE_TIMEOUT_S = 15.0
#: inputs with a size hint below this many chars route to the host
#: engine even on a healthy device; VAPORETTO_TPU_BULK_CHARS overrides.
#: Sizing: the host engine serves ~1M chars in tens of ms; the device
#: path's fixed costs (jit of the batch shapes, dispatch round trips,
#: first readback) exceed that even on healthy PCIe attachments.
BULK_THRESHOLD_CHARS = 1_000_000


def _dispatch_threshold_s() -> float:
    ms = os.environ.get("VAPORETTO_TPU_DISPATCH_THRESHOLD_MS")
    if ms:
        try:
            return float(ms) / 1e3
        except ValueError:
            pass
    return DISPATCH_THRESHOLD_S


def bulk_threshold_chars() -> int:
    v = os.environ.get("VAPORETTO_TPU_BULK_CHARS")
    if v:
        try:
            return int(v)
        except ValueError:
            pass
    return BULK_THRESHOLD_CHARS


_probe_cache: Optional[bool] = None


def device_dispatch_ok(timeout_s: Optional[float] = None) -> bool:
    """True when the attached accelerator completes a tiny dispatch +
    readback promptly (see module docstring); cached per process
    (``VAPORETTO_TPU_REPROBE=1`` discards the cached verdict once)."""
    global _probe_cache
    if os.environ.get("VAPORETTO_TPU_REPROBE") == "1":
        _probe_cache = None
        os.environ.pop("VAPORETTO_TPU_REPROBE", None)
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
    _probe_cache = rt is not None and rt < _dispatch_threshold_s()
    return _probe_cache


def resolve_backend(requested: str, native_available: bool,
                    need_device: bool = False,
                    bulk_hint: Optional[int] = None) -> str:
    """Resolve a requested backend ("device" | "host" | "auto").

    ``native_available``: whether the C++ host engine can serve this
    model. ``need_device``: the caller needs device execution regardless
    (e.g. ``--dp`` mesh sharding). ``bulk_hint``: cheap upper bound on
    the input size in chars (None = unknown -> assumed bulk); tiny
    hinted inputs route to host even on a healthy device (the bulk term
    of the documented policy — see module docstring).
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
    if bulk_hint is not None and bulk_hint < bulk_threshold_chars():
        # healthy device, tiny input: compile + dispatch round trips
        # alone exceed the whole host evaluation
        return "host"
    return "device" if device_dispatch_ok() else "host"


def input_size_hint(stream) -> Optional[int]:
    """Cheap upper bound on a binary input stream's size in chars, for
    the routing bulk term: a seekable file reports its remaining bytes
    (>= chars in UTF-8), a TTY reports 0 (interactive), anything else
    None (unknown)."""
    try:
        if stream.isatty():
            return 0
    except Exception:
        pass
    try:
        if stream.seekable():
            pos = stream.tell()
            size = os.fstat(stream.fileno()).st_size
            return max(int(size) - int(pos), 0)
    except Exception:
        pass
    return None
