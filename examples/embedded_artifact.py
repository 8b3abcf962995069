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
    model = Model.read(model_path)
    predictor = Predictor(model, predict_tags=True)
    blob = predictor.serialize_to_vec()
    print(f"compiled artifact: {len(blob)} bytes")
    return blob


def run_time(blob: bytes) -> None:
    t0 = time.perf_counter()
    predictor = Predictor.deserialize_from_slice(blob)
    print(f"artifact load: {time.perf_counter() - t0:.4f}s (no compiler run)")
    s = Sentence.from_raw("まぁ社長は火星猫だ")
    predictor.predict(s)
    s.fill_tags()
    print(s.write_tokenized_text())


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/resources/model.bin"
    run_time(build_time(path))
