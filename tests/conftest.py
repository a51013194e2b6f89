"""Test environment: force an 8-virtual-device CPU platform BEFORE jax
imports so multi-chip sharding logic is exercised without a TPU pod
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=N CPU-mesh
simulation).  Pallas kernels run in interpreter mode on CPU (ops/topk.py
picks interpret automatically off-TPU)."""

from __future__ import annotations

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
