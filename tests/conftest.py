"""Test env: force CPU JAX with 8 virtual devices so mesh/sharding tests run
without a TPU pod (SURVEY.md section 4 item 4), with full-precision matmuls
so torch-oracle parity holds.

Note: in the axon-tunnel image a sitecustomize registers the TPU plugin and
forces jax_platforms='axon,cpu' at interpreter start, overriding the
JAX_PLATFORMS env var — so the CPU selection must happen via jax.config
here, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# 8 virtual device threads timeshare the host's real cores; on a loaded or
# single-core host a straggler can exceed XLA:CPU's 40 s collective
# rendezvous termination default, which ABORTS the test process
# (rendezvous.cc). Liveness watchdog only — raise it.
if "collective_call_terminate_timeout" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    )
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls everywhere: TPU DEFAULT precision is bf16-ish, which breaks
# 1e-4-level parity tests (and this also pins CPU matmul codegen)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
