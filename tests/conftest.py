"""Test environment: force an 8-virtual-device CPU platform BEFORE any test
imports jax, so multi-chip sharding logic is exercised without a TPU pod
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=N CPU-mesh
simulation).  Pallas kernels run in interpreter mode on CPU (ops/topk.py
picks interpret automatically off-TPU).

NOTE: this machine's axon TPU plugin prepends itself to JAX_PLATFORMS at
interpreter startup, so the env var alone is NOT enough — we must also
update jax.config after import, or tests silently run on (and contend for)
the single tunneled TPU chip.
"""

from __future__ import annotations

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
