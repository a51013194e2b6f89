"""Device-memory capacity model for the HBM-resident stores.

SURVEY.md §7 hard-part 3 is growing an HBM-resident matrix; this module
answers the operational question that comes with it: *how many rows fit
one chip, and what happens when you exceed that?*  Without a model, an
append/build/train past capacity dies inside the runtime with a device
OOM abort (which on remote-attached runtimes can also sicken the relay);
with it, the store raises a clean, actionable :class:`DeviceCapacityError`
BEFORE allocating.

The model (per device):

* primary corpus: ``capacity × dim × itemsize(store_dtype)`` bytes;
* int8 shadow (``quantized=True``): ``capacity × (dim + 4)`` bytes
  (int8 rows + one f32 scale per row);
* growth transient: ``_grow_to`` doubles geometrically with a device-side
  copy, so the OLD buffer coexists with the new one during the copy —
  the check charges ``old + new`` at grow time (the true peak);
* everything else (scan partials, query stacks, rescore gathers, XLA
  temps) rides in the safety margin: the budget is multiplied by
  ``PSE_HBM_SAFETY`` (default 0.90).

The budget resolves in order: ``PSE_HBM_BYTES`` env (0 disables the check
entirely), the backend's ``memory_stats()["bytes_limit"]``, then a 16 GiB
TPU default (v5e/v5p-lite class).  On non-TPU backends with no explicit
budget the check is OFF — host RAM is the relevant limit there and the
OS already fails allocations cleanly.

Reference parity note: the reference has no equivalent (FAISS grows in
host RAM and the OS handles it — utils/vector_store.py keeps everything
in process memory); this is TPU-specific operational machinery.  The
measured table lives in docs/OPERATIONS.md ("Single-chip capacity").
"""

from __future__ import annotations

import os
from typing import Optional

_TPU_DEFAULT_HBM = 16 * 1024**3  # v5e-class chips
_DEFAULT_SAFETY = 0.90


class DeviceCapacityError(RuntimeError):
    """A store/index operation would exceed the device memory budget.

    Raised BEFORE the allocation, with the capacity math in the message,
    so serving degrades with a clean 500 + actionable error instead of a
    device OOM abort."""


def device_hbm_budget() -> Optional[int]:
    """Usable device-memory budget in bytes, or ``None`` when the
    capacity check is disabled (non-TPU backend with no explicit budget,
    or ``PSE_HBM_BYTES=0``)."""
    env = os.environ.get("PSE_HBM_BYTES", "").strip()
    if env:
        value = int(env)
        return value if value > 0 else None
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit
    except Exception:  # noqa: BLE001 — stats are best-effort per backend
        pass
    if jax.default_backend() == "tpu":
        return _TPU_DEFAULT_HBM
    return None


def safety_factor() -> float:
    return float(os.environ.get("PSE_HBM_SAFETY", _DEFAULT_SAFETY))


def store_bytes(
    capacity: int, dim: int, itemsize: int, quantized: bool
) -> int:
    """Resident bytes of one store at ``capacity`` padded rows."""
    primary = capacity * dim * itemsize
    shadow = capacity * (dim + 4) if quantized else 0
    return primary + shadow


def max_rows_for_budget(
    dim: int, itemsize: int, quantized: bool, budget: Optional[int] = None
) -> Optional[int]:
    """Largest steady-state row count the budget holds (excluding the
    growth transient — i.e. what ``load_device_rows`` or a loaded
    checkpoint can hold; appends that GROW past half of this pay the
    old+new copy transient)."""
    if budget is None:
        budget = device_hbm_budget()
    if budget is None:
        return None
    per_row = dim * itemsize + ((dim + 4) if quantized else 0)
    return int(budget * safety_factor()) // per_row


def check_store_allocation(
    new_capacity: int,
    old_capacity: int,
    dim: int,
    itemsize: int,
    quantized: bool,
    *,
    extra_bytes: int = 0,
    what: str = "embedding store growth",
) -> None:
    """Raise :class:`DeviceCapacityError` if allocating ``new_capacity``
    rows (while ``old_capacity`` rows are still resident — the grow-copy
    transient — plus any ``extra_bytes`` of other device-resident input,
    e.g. the source rows of a device-corpus install) would exceed the
    device budget."""
    budget = device_hbm_budget()
    if budget is None:
        return
    usable = int(budget * safety_factor())
    needed = (
        store_bytes(new_capacity, dim, itemsize, quantized)
        + store_bytes(old_capacity, dim, itemsize, quantized)
        + extra_bytes
    )
    if needed <= usable:
        return
    ceiling = max_rows_for_budget(dim, itemsize, quantized, budget)
    resident_clause = (
        f" and {extra_bytes / 1e9:.2f} GB of resident input"
        if extra_bytes
        else ""
    )
    raise DeviceCapacityError(
        f"{what} to {new_capacity} x {dim} rows needs ~{needed / 1e9:.2f} GB "
        f"device memory (incl. the old-buffer copy transient of "
        f"{old_capacity} rows{resident_clause}) but only ~{usable / 1e9:.2f} GB of the "
        f"{budget / 1e9:.2f} GB budget is usable "
        f"(PSE_HBM_SAFETY={safety_factor():.2f}). Single-chip ceiling at "
        f"this config is ~{ceiling} rows. Options: shard over a mesh "
        f"(MESH_DEVICES=N), drop the int8 shadow (STORE_QUANTIZED=0), "
        f"use bfloat16 storage (STORE_DTYPE=auto), or raise "
        f"PSE_HBM_BYTES if the device has more memory."
    )
