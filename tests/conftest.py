"""Test config: force CPU with 8 virtual devices so mesh/sharding semantics are
testable without a pod (the TPU-native analog of a fake distributed backend —
see SURVEY.md §4).

The driver environment pins JAX_PLATFORMS to the real tunneled TPU chip and
imports jax at interpreter start (sitecustomize), so plain env-var edits are
too late — the platform must be overridden through jax.config before any
backend initialization.  Unit tests need fp32 CPU matmuls (the numerics
oracles assume them) and 8 devices (the sharding tests need a mesh).
"""

import os
import sys

# XLA_FLAGS is read when the CPU client is created, which happens after this
# conftest is imported — safe to set here.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
