"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (standard JAX simulation substitute).

Note: the environment's sitecustomize registers an 'axon' TPU backend and
sets jax_platforms='axon,cpu' at interpreter start, so env vars alone are
not enough — we must also override jax.config before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# On hosts with bf16 ISA extensions (amx-bf16/avx512bf16) XLA:CPU computes
# "default"-precision f32 convs/matmuls through a bf16 fast path (~3e-3
# error), which breaks float-exact parity gates. Pin true f32 for tests.
jax.config.update("jax_default_matmul_precision", "highest")

from trainner_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
