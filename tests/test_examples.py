"""Smoke tests for the deployment examples.

The reference ships deployment targets as examples (examples/wasm/,
examples/embedded_device/); ours are the batch serving loop and the AOT
artifact flow. Run as subprocesses on CPU, like the CLI tests.
"""

import subprocess
import sys

MODEL_BIN = "/root/reference/resources/model.bin"
_ENV = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": "/root/repo", "HOME": "/root"}


def test_serve_example():
    """WASM-demo parity (examples/wasm/src/lib.rs:48-128): tags filled,
    wsconst D/G filters, original-text mapping, and instant revive from
    the cached AOT artifact on the second run."""
    def run():
        return subprocess.run(
            [sys.executable, "examples/serve.py", MODEL_BIN],
            input="まぁ社長は火星猫だ\n火星猫だ\n123 456\n",
            capture_output=True, text=True, timeout=560, env=_ENV,
            cwd="/root/repo",
        )

    out = run()
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    assert lines[0] == (
        "まぁ/名詞/マー 社長/名詞/シャチョー は/助詞/ワ "
        "火星/名詞/カセー 猫/名詞/ネコ だ/助動詞/ダ"
    )
    assert lines[1] == "火星/名詞/カセー 猫/名詞/ネコ だ/助動詞/ダ"
    # wsconst D keeps the digit runs unsegmented; the original (pre-
    # normalization) halfwidth digits and escaped space are preserved
    assert lines[2].startswith("123")
    assert "123\\ 456" in lines[2] or "123" in lines[2].split()[0]
    out2 = run()
    assert out2.returncode == 0, out2.stderr
    assert "revived predictor from artifact" in out2.stderr
    assert out2.stdout == out.stdout


def test_embedded_artifact_example():
    out = subprocess.run(
        [sys.executable, "examples/embedded_artifact.py", MODEL_BIN],
        capture_output=True, text=True, timeout=560, env=_ENV,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "compiled artifact (flash analogue):" in out.stdout
    assert "packed runtime tables (RAM analogue):" in out.stdout
    assert "artifact load:" in out.stdout
    assert "load-to-first-predict:" in out.stdout
    assert out.stdout.rstrip().endswith(
        "まぁ/名詞/マー 社長/名詞/シャチョー は/助詞/ワ "
        "火星/名詞/カセー 猫/名詞/ネコ だ/助動詞/ダ"
    )
