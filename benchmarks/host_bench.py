"""Native host-predictor benchmark (CPU only; no TPU required).

Reproduces the PERF.md host numbers: the C++ evaluator
(native/host_predictor.cc) running the compiled tables on the host CPU —
the low-latency path (`predict --backend host`) and the analogue of the
reference's single-threaded predictor (its published throughput is
~40 Mchars/s; BASELINE.md).

Prints JSON lines:
  {"case": "long-line-1core", "mchars_per_s": ...}
  {"case": "long-line-mt", "mchars_per_s": ...}   (worker threads)
  {"case": "short-sentences", "us_per_sentence": ...}

Run: python benchmarks/host_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# host-only: keep jax off the TPU (tables are compiled host-side anyway)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from vaporetto_tpu.models.model import Model  # noqa: E402
from vaporetto_tpu.predictor import Predictor  # noqa: E402
from vaporetto_tpu.sentence import Sentence  # noqa: E402

MODEL = "/root/reference/resources/model.bin"


def main() -> int:
    pred = Predictor(Model.read(MODEL), False, backend="host")
    host = pred._host()
    if host is None:
        print(json.dumps({"error": "native library unavailable"}))
        return 1

    rng = np.random.default_rng(3)
    pools = np.concatenate([
        np.arange(0x3041, 0x3097), np.arange(0x30A1, 0x30FB),
        np.arange(0x4E00, 0x5000), np.arange(0x30, 0x3A),
    ])
    n = 1_000_000
    text = "".join(chr(c) for c in pools[rng.integers(0, len(pools), n)])

    # single-threaded long line (reference comparison point)
    s = Sentence.from_raw(text)
    host.predict_batch([s.codepoints], [s.char_types], n_threads=1)  # warm
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        host.predict_batch([s.codepoints], [s.char_types], n_threads=1)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "case": "long-line-1core",
        "mchars_per_s": round(n * reps / dt / 1e6, 1),
        "vs_reference_40mchars": round(n * reps / dt / 40e6, 2),
    }), flush=True)

    # multithreaded batch (256 lines x ~4k chars)
    lines = [Sentence.from_raw(text[i:i + 3906]) for i in range(0, n, 3906)]
    cps = [x.codepoints for x in lines]
    cts = [x.char_types for x in lines]
    host.predict_batch(cps, cts)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        host.predict_batch(cps, cts)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "case": "long-line-mt",
        "threads": os.cpu_count(),
        "mchars_per_s": round(n * reps / dt / 1e6, 1),
    }), flush=True)

    # short-sentence latency through the full Python API
    short = [Sentence.from_raw(text[i:i + 50]) for i in range(0, 5000, 50)]
    for x in short:
        pred.predict(x)  # warm
    t0 = time.perf_counter()
    for _ in range(10):
        for x in short:
            pred.predict(x)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "case": "short-sentences",
        "us_per_sentence": round(dt / (10 * len(short)) * 1e6, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
