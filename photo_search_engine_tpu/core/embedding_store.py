"""HBM-resident embedding matrix with incremental append.

The device-side analogue of FAISS's internal flat storage
(reference utils/vector_store.py:143-169 add_item + faiss Index storage).
Design (SURVEY.md §7.1, §7 hard part 3):

* The corpus lives on device as a capacity-padded ``[capacity, D]`` array
  (capacity a multiple of the top-k kernel's row block) so searches never
  re-pad/copy the corpus; ``count`` masks the live rows.
* Appends update the device buffer in place via a donated
  ``dynamic_update_slice`` (no full re-upload); capacity grows
  geometrically with a device-side copy.
* A float32 host mirror is kept for persistence / ``reconstruct`` —
  checkpoints are exact regardless of the device storage dtype.
"""

from __future__ import annotations

import hashlib
import threading
from collections import OrderedDict
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from photo_search_engine_tpu.core import capacity as capacity_mod
from photo_search_engine_tpu.ops import grouped_mask as grouped_ops
from photo_search_engine_tpu.ops import quantized as quant_ops
from photo_search_engine_tpu.ops import topk as topk_ops

_APPEND_PAD = 8  # append chunks padded to a multiple of this to bound recompiles


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _update_slice(buf: jnp.ndarray, rows: jnp.ndarray, start) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(buf, rows.astype(buf.dtype), (start, 0))


# Donating `buf` lets XLA update the corpus in place instead of copying GBs.
_update_slice_jit = jax.jit(_update_slice, donate_argnums=(0,))


class EmbeddingStore:
    """Append-only device embedding matrix + search entry point."""

    def __init__(
        self,
        dimension: int,
        *,
        metric: str = "cosine",
        store_dtype: str = "float32",
        block_rows: Optional[int] = None,
        quantized: bool = False,
        int8_kloc: Optional[int] = None,
        int8_cand: Optional[int] = None,
    ) -> None:
        if metric not in {"cosine", "l2", "ip"}:
            raise ValueError("metric must be cosine, l2 or ip")
        self.dimension = int(dimension)
        self.metric = metric
        self.store_dtype = jnp.dtype(topk_ops.resolve_store_dtype(store_dtype))
        # kernel block = capacity alignment; VMEM-budget-aware by dim/dtype
        self.block_rows = int(
            block_rows
            if block_rows is not None
            else topk_ops.default_block_n(self.store_dtype, self.dimension)
        )
        # int8 shadow corpus: halves/quarters scan HBM traffic; searches with
        # impl="int8" scan it and exact-rescore against the primary corpus
        # (ops/quantized.py).  Capacity must align to BOTH kernel blocks so
        # neither search path re-pads (re-padding copies the whole corpus):
        # block_rows drops to a power of two and capacity aligns to the LCM.
        # Accepts "auto" (True on TPU) like the serving config does.
        self.quantized = quant_ops.resolve_store_quantized(quantized)
        # int8 nomination knobs (None = safe defaults, see ops/quantized.py):
        # kloc < k trades burst-safety for ~1.3× scan QPS on corpora whose
        # insertion order does not cluster near-duplicates
        self.int8_kloc = int8_kloc
        self.int8_cand = int8_cand
        # MXU feed for the int8 scan (INT8_FEED env / auto — see
        # ops/quantized.resolve_int8_feed); pinned at construction so the
        # kernel block size and capacity alignment stay consistent
        self.int8_feed = quant_ops.resolve_int8_feed(None)
        self._i8_block = quant_ops.default_block_n_int8(
            self.dimension, self.int8_feed
        )
        if self.quantized:
            self.block_rows = max(128, 1 << (self.block_rows.bit_length() - 1))
        # the LCM, not the max: capacity must divide by BOTH block sizes or
        # the non-aligned search path re-pads (a whole-corpus device copy
        # per call) whenever block_rows does not divide _i8_block (e.g.
        # dim=3072: block_rows=512, _i8_block=1280)
        self._capacity_align = (
            int(np.lcm(self.block_rows, self._i8_block))
            if self.quantized
            else self.block_rows
        )
        self._count = 0
        self._device: Optional[jnp.ndarray] = None  # [capacity, D] store dtype
        self._device_i8: Optional[jnp.ndarray] = None  # [capacity, D] int8
        self._scales: Optional[jnp.ndarray] = None     # [capacity] f32
        self._host = np.zeros((0, self.dimension), np.float32)
        # device-resident filter masks, keyed by content digest: repeated
        # filtered searches (season buckets etc.) skip the [capacity]-int8
        # host→device upload (1 MB/call at 1M rows)
        self._mask_lru: "OrderedDict[Tuple[bytes, int], jnp.ndarray]" = OrderedDict()
        # pipelined micro-batches (core/batcher.py pipeline>1) hit this LRU
        # from concurrent threads; get/move_to_end racing popitem is a
        # sporadic KeyError without the lock
        self._mask_lru_lock = threading.Lock()

    # ------------------------------------------------------------------
    @property
    def _host(self) -> np.ndarray:
        """Float32 host mirror. Normally written eagerly by ``append`` (so
        checkpoints keep full float32 precision); after
        ``load_device_rows`` it materializes lazily by downloading the
        device store (store-dtype precision) on first use."""
        if self._host_cache is None:
            self._host_cache = np.asarray(
                self._device[: self._count].astype(jnp.float32)
            )
        return self._host_cache

    @_host.setter
    def _host(self, value: np.ndarray) -> None:
        self._host_cache = value

    @property
    def count(self) -> int:
        return self._count

    @property
    def capacity(self) -> int:
        return 0 if self._device is None else int(self._device.shape[0])

    def _prepare(self, vectors: np.ndarray) -> np.ndarray:
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if vectors.shape[1] != self.dimension:
            raise ValueError(
                f"vector dimension mismatch: {vectors.shape[1]} != {self.dimension}"
            )
        if self.metric == "cosine":
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            # zero vectors stay as-is (reference vector_store.py:86-90)
            vectors = np.where(norms > 0, vectors / np.maximum(norms, 1e-30), vectors)
        return vectors

    def _grow_to(self, needed: int) -> None:
        new_capacity = _round_up(max(needed, 2 * self.capacity), self._capacity_align)
        # clean pre-allocation ceiling check: past-capacity growth raises
        # DeviceCapacityError instead of a device OOM abort
        # (core/capacity.py; docs/OPERATIONS.md "Single-chip capacity")
        capacity_mod.check_store_allocation(
            new_capacity,
            self.capacity,
            self.dimension,
            self.store_dtype.itemsize,
            self.quantized,
            what="embedding store growth",
        )
        fresh = jnp.zeros((new_capacity, self.dimension), self.store_dtype)
        if self._device is not None and self._count > 0:
            fresh = _update_slice_jit(fresh, self._device[: self.capacity], 0)
        self._device = fresh
        if self.quantized:
            fresh_i8 = jnp.zeros((new_capacity, self.dimension), jnp.int8)
            fresh_sc = jnp.zeros((new_capacity, 1), jnp.float32)
            if self._device_i8 is not None and self._count > 0:
                fresh_i8 = _update_slice_jit(fresh_i8, self._device_i8, 0)
                fresh_sc = _update_slice_jit(fresh_sc, self._scales, 0)
            self._device_i8 = fresh_i8
            self._scales = fresh_sc

    def load_device_rows(self, rows_dev: jnp.ndarray) -> None:
        """Install an already-on-device corpus directly into an empty store.

        Ingest bypass for benches/load tests whose corpora are synthesized
        on device: appending a host-built 1M×1536 corpus costs a multi-GB
        host→device upload — tens of minutes on remote-attached runtimes
        (the reason bench.py and tools/recall_eval.py generate on device).
        Rows must already be L2-normalized when ``metric == "cosine"``.
        The float32 host mirror materializes lazily by downloading the
        device store, so it carries store-dtype (possibly bfloat16)
        precision — do not treat such a store as an exact checkpoint
        source the way ``append``-built stores are.

        When the rows already match the capacity alignment and store
        dtype they are ADOPTED as the store buffer (zero-copy — no
        install transient, full ceiling reachable).  The caller must not
        reuse the array afterwards in any donating computation: deleting
        its buffer deletes the store's corpus.
        """
        if self._count:
            raise RuntimeError("load_device_rows requires an empty store")
        rows_dev = jnp.asarray(rows_dev)
        if rows_dev.ndim != 2 or rows_dev.shape[1] != self.dimension:
            raise ValueError(
                f"expected [N, {self.dimension}] rows, got {rows_dev.shape}"
            )
        n = int(rows_dev.shape[0])
        if n == 0:
            return
        capacity = _round_up(n, self._capacity_align)
        if capacity == n and rows_dev.dtype == self.store_dtype:
            # Zero-copy install: the caller's rows ARE ADOPTED as the
            # store buffer (no padding copy, no source-coexistence
            # transient — reaching the full install ceiling is the
            # point).  The caller must treat the array as surrendered:
            # donating it into a later jit deletes the store's corpus.
            capacity_mod.check_store_allocation(
                capacity,
                0,
                self.dimension,
                self.store_dtype.itemsize,
                self.quantized,
                what="device-corpus install",
            )
            self._device = rows_dev
        else:
            # The source rows stay device-resident while the padded store
            # buffer is allocated and filled — charge that coexistence
            # transient or a near-ceiling install dies with the device
            # OOM abort this check exists to prevent.  A dtype-mismatched
            # source additionally materializes an eager astype copy in
            # store dtype that coexists with both buffers.
            src_bytes = int(rows_dev.size) * rows_dev.dtype.itemsize
            if rows_dev.dtype != self.store_dtype:
                src_bytes += int(rows_dev.size) * self.store_dtype.itemsize
            capacity_mod.check_store_allocation(
                capacity,
                0,
                self.dimension,
                self.store_dtype.itemsize,
                self.quantized,
                extra_bytes=src_bytes,
                what="device-corpus install",
            )
            padded = jnp.zeros((capacity, self.dimension), self.store_dtype)
            padded = _update_slice_jit(padded, rows_dev.astype(self.store_dtype), 0)
            self._device = padded
        if self.quantized:
            # chunked like IVFIndex._ensure_quantized: a whole-capacity
            # quantize materializes an f32 temp the size of the corpus
            i8 = jnp.zeros((capacity, self.dimension), jnp.int8)
            sc = jnp.zeros((capacity, 1), jnp.float32)
            chunk = 131072
            for start in range(0, capacity, chunk):
                qc, s = quant_ops.quantize_rows(self._device[start : start + chunk])
                i8 = _update_slice_jit(i8, qc, start)
                sc = _update_slice_jit(sc, s[:, None], start)
            self._device_i8 = i8
            self._scales = sc
        self._count = n
        self._host_cache = None  # lazy download on first snapshot/reconstruct

    def append(self, vectors: np.ndarray) -> None:
        """Append rows (normalizing for cosine) to host mirror + device."""
        vectors = self._prepare(vectors)
        n_new = vectors.shape[0]
        if n_new == 0:
            return
        self._host = np.concatenate([self._host, vectors], axis=0)
        needed = self._count + n_new
        padded_len = _round_up(n_new, _APPEND_PAD)
        if self._count + padded_len > self.capacity:
            self._grow_to(self._count + padded_len)
        # Tail padding writes zeros past count — harmless: count masks them
        # and later appends overwrite them.
        chunk = np.zeros((padded_len, self.dimension), np.float32)
        chunk[:n_new] = vectors
        chunk_dev = jnp.asarray(chunk)
        self._device = _update_slice_jit(self._device, chunk_dev, self._count)
        if self.quantized:
            q_chunk, sc_chunk = quant_ops.quantize_rows(chunk_dev)
            self._device_i8 = _update_slice_jit(self._device_i8, q_chunk, self._count)
            self._scales = _update_slice_jit(
                self._scales, sc_chunk[:, None], self._count
            )
        self._count = needed

    _MASK_LRU_SIZE = 32

    def _device_mask(self, mask: np.ndarray) -> jnp.ndarray:
        """Capacity-padded device mask, LRU-cached by content digest.
        Hashing/uploading 1 byte/row (int8; the kernel wrapper casts to
        int32 on device) beats re-hashing 4 bytes/row every call."""
        mask_arr = np.zeros(self.capacity, np.int8)
        mask_arr[: self._count] = np.asarray(mask[: self._count], bool)
        digest = hashlib.blake2b(mask_arr.tobytes(), digest_size=16).digest()
        key = (digest, self.capacity)
        with self._mask_lru_lock:
            cached = self._mask_lru.get(key)
            if cached is not None:
                self._mask_lru.move_to_end(key)
                return cached
        mask_dev = jnp.asarray(mask_arr)
        with self._mask_lru_lock:
            self._mask_lru[key] = mask_dev
            while len(self._mask_lru) > self._MASK_LRU_SIZE:
                self._mask_lru.popitem(last=False)
        return mask_dev

    # ------------------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        mask: Optional[np.ndarray] = None,
        impl: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k over live rows; returns host (distances, indices).

        ``mask`` is a length-``count`` boolean/int filter (device-masked
        scan — the ES-filter analogue, SURVEY.md §7.1c).
        """
        if self._count == 0:
            q = np.atleast_2d(np.asarray(queries)).shape[0]
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int32)
        queries = self._prepare(np.asarray(queries, np.float32))
        mask_dev = None
        if mask is not None:
            mask_dev = self._device_mask(mask)
        metric = "ip" if self.metric == "cosine" else self.metric
        if impl == "int8" and not self.quantized:
            raise ValueError("impl='int8' requires EmbeddingStore(quantized=True)")
        if impl == "int8" and min(k, self._count) <= quant_ops._INT8_MAX_K:
            dists, idx = quant_ops.int8_search(
                self._device_i8,
                self._scales[:, 0],
                self._device,
                jnp.asarray(queries, jnp.float32),
                min(k, self._count),
                count=self._count,
                mask=mask_dev,
                metric=metric,
                kloc=self.int8_kloc,
                cand=self.int8_cand,
                block_n=self._i8_block,
                feed=self.int8_feed,
            )
        elif (
            # int8 serving over-fetch (candidate_k up to 500) exceeds the
            # int8 kernel's nomination bound — take the SAME ApproxTopK
            # large-candidate route the bf16 default takes, instead of the
            # full exact sort int8_search would fall back to (the 51 ms
            # vs 7.5 ms device-path difference at 1M, docs/ROUND4.md)
            impl in ("auto", "int8")
            and min(k, self._count) > topk_ops._PALLAS_MAX_K
            and topk_ops._use_approx_large_k(self._count)
            and not getattr(self, "_approx_large_k_broken", False)
        ):
            # serving over-fetch (candidate_k up to 500, reference
            # searcher.py:771-820) exceeds the fused kernel's k<=64
            # extraction; at million scale ApproxTopK beats the full sort
            # the lax fallback would pay (tail recall 0.99 — the tail only
            # feeds fusion/threshold statistics).  exact_search itself
            # stays bit-exact vs the oracle (CLAUDE.md contract); this is
            # a store-level routing decision, overridable with
            # TOPK_EXACT_LARGE_K=1 or an explicit impl=.
            try:
                dists, idx = topk_ops.approx_search_large_k(
                    self._device,
                    jnp.asarray(queries, self.store_dtype),
                    min(k, self._count),
                    count=self._count,
                    mask=mask_dev,
                    metric=metric,
                )
            except Exception as exc:  # noqa: BLE001 — fail-soft to exact
                # ApproxTopK availability varies by backend/stack; a
                # compile or lowering failure must degrade to the exact
                # sort, not 500 the serving path (graceful-degradation
                # design rule)
                print(f"[WARN] ApproxTopK unavailable ({exc}); exact sort")
                self._approx_large_k_broken = True
                dists, idx = topk_ops.exact_search(
                    self._device,
                    jnp.asarray(queries, self.store_dtype),
                    min(k, self._count),
                    count=self._count,
                    mask=mask_dev,
                    metric=metric,
                    impl="auto" if impl == "int8" else impl,
                    block_n=self.block_rows,
                )
        else:
            dists, idx = topk_ops.exact_search(
                self._device,
                jnp.asarray(queries, self.store_dtype),
                min(k, self._count),
                count=self._count,
                mask=mask_dev,
                metric=metric,
                impl="auto" if impl == "int8" else impl,
                block_n=self.block_rows,
            )
        return np.asarray(dists), np.asarray(idx)

    # ------------------------------------------------------------------
    def grouped_search(
        self,
        queries: np.ndarray,
        k: int,
        mask_table: np.ndarray,  # [M, count] bool/int — distinct predicates
        mask_ids: np.ndarray,    # [Q] int — each query's predicate row
        *,
        impl: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched per-query filtered top-k (ops/grouped_mask.py): one
        device scan for a batch whose queries carry DIFFERENT predicates.
        Inner-product/cosine only; l2 stores fall back to per-query
        masked scans."""
        if self._count == 0:
            q = np.atleast_2d(np.asarray(queries)).shape[0]
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int32)
        queries = self._prepare(np.asarray(queries, np.float32))
        if self.metric == "l2":
            outs = [
                self.search(queries[i], k, mask=np.asarray(mask_table)[mask_ids[i]],
                            impl=impl if impl != "int8" else "auto")
                for i in range(queries.shape[0])
            ]
            return (
                np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]),
            )
        k = min(k, self._count)
        table = np.zeros((len(mask_table), self.capacity), np.int8)
        table[:, : self._count] = np.asarray(mask_table)[:, : self._count]
        ids = jnp.asarray(np.asarray(mask_ids, np.int32))
        if impl == "int8" and not self.quantized:
            raise ValueError("impl='int8' requires EmbeddingStore(quantized=True)")
        if impl == "int8" and k <= quant_ops._INT8_MAX_K:
            dists, idx = quant_ops.grouped_int8_search(
                self._device_i8,
                self._scales[:, 0],
                self._device,
                jnp.asarray(queries, jnp.float32),
                jnp.asarray(table),
                ids,
                k,
                count=self._count,
                kloc=self.int8_kloc,
                cand=self.int8_cand,
                block_n=self._i8_block,
                feed=self.int8_feed,
            )
        else:
            if (
                # int8 + large k: take the grouped ApproxTopK route (the
                # grouped mirror of search()'s int8 large-k routing) —
                # grouped_int8_search would fall back to the full-sort
                # oracle at this k
                impl in ("auto", "int8")
                and k > topk_ops._PALLAS_MAX_K
                and topk_ops._use_approx_large_k(self._count)
                and not getattr(self, "_approx_large_k_broken", False)
            ):
                # the grouped mirror of the plain-search ApproxTopK
                # routing above: same gate, same TOPK_EXACT_LARGE_K=1
                # override, same fail-soft latch
                try:
                    dists, idx = grouped_ops.grouped_approx_large_k(
                        self._device,
                        jnp.asarray(queries, self.store_dtype),
                        jnp.asarray(table),
                        ids,
                        k,
                        count=self._count,
                    )
                    return np.asarray(dists), np.asarray(idx)
                except Exception as exc:  # noqa: BLE001 — fail-soft
                    print(f"[WARN] grouped ApproxTopK unavailable ({exc}); exact sort")
                    self._approx_large_k_broken = True
            dists, idx = grouped_ops.grouped_mask_search(
                self._device,
                jnp.asarray(queries, self.store_dtype),
                jnp.asarray(table),
                ids,
                k,
                count=self._count,
                impl="auto" if impl == "int8" else impl,
                block_n=self.block_rows,
            )
        return np.asarray(dists), np.asarray(idx)

    # ------------------------------------------------------------------
    def reconstruct(self, index: int) -> np.ndarray:
        if not 0 <= index < self._count:
            raise IndexError(index)
        return self._host[index].copy()

    def snapshot(self) -> np.ndarray:
        """Float32 host copy of live rows (for persistence)."""
        return self._host[: self._count].copy()

    def snapshot_range(self, start: int, stop: int) -> np.ndarray:
        """Float32 host copy of rows [start, stop) — O(stop-start); the
        segmented durability path flushes only the new rows per batch."""
        stop = min(stop, self._count)
        return self._host[start:stop].copy()

    def clear(self) -> None:
        self._count = 0
        self._device = None
        self._device_i8 = None
        self._scales = None
        self._host = np.zeros((0, self.dimension), np.float32)
        self._mask_lru.clear()

    @classmethod
    def from_array(
        cls,
        array: np.ndarray,
        *,
        metric: str = "cosine",
        store_dtype: str = "float32",
        block_rows: Optional[int] = None,
        already_normalized: bool = False,
        quantized: bool = False,
        int8_kloc: Optional[int] = None,
        int8_cand: Optional[int] = None,
    ) -> "EmbeddingStore":
        store = cls(
            array.shape[1],
            metric=metric,
            store_dtype=store_dtype,
            block_rows=block_rows,
            quantized=quantized,
            int8_kloc=int8_kloc,
            int8_cand=int8_cand,
        )
        # Normalization is idempotent, so already-normalized input is safe.
        del already_normalized
        store.append(array)
        return store
