"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
compile and execute without TPU hardware (SURVEY.md §4 implication (d)).

The environment preloads jax with the axon TPU backend at interpreter
startup and exports ``JAX_PLATFORMS=axon``, so env vars alone don't stick —
the platform must be forced through jax.config after import.

Set VAPORETTO_TPU_TEST_REAL_DEVICE=1 to run on whatever JAX finds.
"""

import os

if not os.environ.get("VAPORETTO_TPU_TEST_REAL_DEVICE"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache makes repeated test runs much faster
from vaporetto_tpu.utils.jaxcfg import ensure_compilation_cache  # noqa: E402

ensure_compilation_cache()


def docs_tok_raws():
    """Raw (untagged) text of each docs.tok gold line, parsed with the
    real tokenized-format unescaper (shared by the conformance tests so
    hand-rolled split(' ')/split('/') parsers don't proliferate)."""
    from vaporetto_tpu.sentence import Sentence

    raws = []
    with open("/root/reference/resources/docs.tok", encoding="utf-8") as f:
        for ln in f:
            if ln.strip():
                raws.append(
                    Sentence.from_tokenized(ln.rstrip("\n")).as_raw_text()
                )
    return raws
