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
