"""--backend auto routing policy (utils/routing.py).

The reference ships one engine that is always its fastest
(predict/src/main.rs); auto routing guarantees the same property here:
the CLI default must never be the slower engine on a given machine.
"""

import os

import pytest

from vaporetto_tpu.utils import routing


class TestResolveBackend:
    def test_explicit_passthrough(self):
        assert routing.resolve_backend("device", True) == "device"
        assert routing.resolve_backend("host", False) == "host"

    def test_unknown_rejected(self):
        with pytest.raises(ValueError):
            routing.resolve_backend("gpu", True)

    def test_auto_without_native_is_device(self):
        assert routing.resolve_backend("auto", False) == "device"

    def test_auto_with_mesh_needs_device(self):
        assert routing.resolve_backend("auto", True, need_device=True) == (
            "device"
        )

    def test_auto_on_cpu_is_host(self):
        # conftest forces the CPU backend: no accelerator -> the native
        # evaluator is the faster engine
        assert routing.resolve_backend("auto", True) == "host"

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("VAPORETTO_TPU_BACKEND", "device")
        assert routing.resolve_backend("auto", True) == "device"
        monkeypatch.setenv("VAPORETTO_TPU_BACKEND", "host")
        assert routing.resolve_backend("auto", False) == "host"


class TestBulkTerm:
    """The documented policy (PERF.md 'Production routing'): tiny
    interactive inputs -> host even on a HEALTHY device; bulk -> device.
    The conftest CPU backend would route host before the bulk term is
    consulted, so a healthy accelerator is simulated by stubbing the
    platform + probe."""

    @staticmethod
    def _healthy(monkeypatch):
        import jax

        class _Dev:
            platform = "tpu"

        monkeypatch.setattr(jax, "devices", lambda: [_Dev()])
        monkeypatch.setattr(routing, "device_dispatch_ok", lambda: True)

    def test_healthy_tiny_routes_host(self, monkeypatch):
        self._healthy(monkeypatch)
        assert routing.resolve_backend("auto", True, bulk_hint=0) == "host"
        assert routing.resolve_backend("auto", True, bulk_hint=500) == (
            "host"
        )

    def test_healthy_bulk_routes_device(self, monkeypatch):
        self._healthy(monkeypatch)
        assert routing.resolve_backend(
            "auto", True, bulk_hint=50_000_000
        ) == "device"

    def test_healthy_unknown_assumed_bulk(self, monkeypatch):
        self._healthy(monkeypatch)
        assert routing.resolve_backend("auto", True, bulk_hint=None) == (
            "device"
        )

    def test_degraded_bulk_routes_host(self, monkeypatch):
        self._healthy(monkeypatch)
        monkeypatch.setattr(routing, "device_dispatch_ok", lambda: False)
        assert routing.resolve_backend(
            "auto", True, bulk_hint=50_000_000
        ) == "host"

    def test_threshold_env_configurable(self, monkeypatch):
        monkeypatch.setenv("VAPORETTO_TPU_BULK_CHARS", "100")
        self._healthy(monkeypatch)
        assert routing.resolve_backend("auto", True, bulk_hint=500) == (
            "device"
        )
        monkeypatch.setenv("VAPORETTO_TPU_DISPATCH_THRESHOLD_MS", "250")
        assert routing._dispatch_threshold_s() == 0.25

    def test_tiny_hint_never_overrides_explicit(self, monkeypatch):
        self._healthy(monkeypatch)
        assert routing.resolve_backend(
            "device", True, bulk_hint=0
        ) == "device"


class TestInputSizeHint:
    def test_seekable_file(self, tmp_path):
        p = tmp_path / "corpus.txt"
        p.write_bytes(b"abc\ndef\n")
        with open(p, "rb") as f:
            assert routing.input_size_hint(f) == 8
            f.read(3)
            assert routing.input_size_hint(f) == 5

    def test_pipe_is_unknown(self):
        import os as _os

        r, w = _os.pipe()
        try:
            with _os.fdopen(r, "rb") as fr:
                # fstat on a pipe reports size 0, which would misread as
                # "tiny"; pipes must report unknown
                assert routing.input_size_hint(fr) is None
        finally:
            _os.close(w)

    def test_tty_is_zero(self):
        class FakeTTY:
            def isatty(self):
                return True

        assert routing.input_size_hint(FakeTTY()) == 0


class TestProbe:
    def test_probe_on_cpu_completes_and_caches(self):
        # the CPU backend dispatches in microseconds: the probe must
        # complete, report ok, and cache its verdict
        routing._probe_cache = None
        try:
            assert routing.device_dispatch_ok(timeout_s=30.0) is True
            assert routing._probe_cache is True
        finally:
            routing._probe_cache = None


def test_cli_default_is_auto():
    import argparse

    from vaporetto_tpu.cli import evaluate, predict

    for mod in (predict, evaluate):
        parser_holder = {}
        orig = argparse.ArgumentParser.parse_args

        def fake(self, argv=None):
            parser_holder["p"] = self
            raise SystemExit(0)

        argparse.ArgumentParser.parse_args = fake
        try:
            with pytest.raises(SystemExit):
                mod.main([])
        finally:
            argparse.ArgumentParser.parse_args = orig
        p = parser_holder["p"]
        backend_action = next(
            a for a in p._actions if a.dest == "backend"
        )
        assert backend_action.default == "auto"
        assert "auto" in backend_action.choices
