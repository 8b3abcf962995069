"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
compile and execute without TPU hardware (SURVEY.md §4 implication (d)).
Set VAPORETTO_TPU_TEST_REAL_DEVICE=1 to run on whatever JAX finds.
"""

import os

if not os.environ.get("VAPORETTO_TPU_TEST_REAL_DEVICE"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
