"""AOT compiled-model artifact flow.

The analogue of the reference's embedded/WASM deployment
(examples/embedded_device/build.rs:17-26, examples/wasm/src/lib.rs):
"build time" compiles the model into packed device tables; "run time"
revives a predictor from the blob without re-running the model compiler —
instant upload to HBM.

Usage: python examples/embedded_artifact.py [model_path]
"""

import sys
import time

from vaporetto_tpu import Model, Predictor, Sentence


def build_time(model_path: str) -> bytes:
    import os

    model = Model.read(model_path)
    predictor = Predictor(model, predict_tags=True)
    blob = predictor.serialize_to_vec()
    # footprint vs the reference's embedded numbers (256 KiB flash /
    # 40 KiB RAM on a Cortex-M4, examples/embedded_device/README.md:7-9):
    # our artifact is the flash analogue (model baked into the binary),
    # the packed in-memory tables are the RAM analogue
    print(f"source model file: {os.path.getsize(model_path)} bytes")
    print(f"compiled artifact (flash analogue): {len(blob)} bytes")
    return blob


def run_time(blob: bytes) -> None:
    t0 = time.perf_counter()
    predictor = Predictor.deserialize_from_slice(blob)
    t_load = time.perf_counter() - t0
    print(f"artifact load: {t_load:.4f}s (no compiler run)")
    c = predictor.compiled
    table_bytes = 0
    for m in (c.char_matcher, c.type_matcher):
        if m is not None:
            for a in (m.base, m.check, m.value, m.inherit, m.rows_first,
                      m.rows_cnt, m.w8, m.off):
                table_bytes += a.nbytes
    if c.type_cache_table is not None:
        table_bytes += c.type_cache_table.nbytes
    if c.char_hash_keys is not None:
        table_bytes += c.char_hash_keys.nbytes + c.char_hash_syms.nbytes
    print(f"packed runtime tables (RAM analogue): {table_bytes} bytes")
    s = Sentence.from_raw("まぁ社長は火星猫だ")
    predictor.predict(s)
    s.fill_tags()
    t_first = time.perf_counter() - t0
    print(f"load-to-first-predict: {t_first:.4f}s")
    print(s.write_tokenized_text())


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/resources/model.bin"
    run_time(build_time(path))
