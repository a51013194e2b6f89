"""Sharded retrieval over a device mesh.

Design (BASELINE.md north star; SURVEY.md §5 distributed-comm statement):
* the embedding matrix is sharded on the row axis across the ``data``
  mesh axis (1 chip = degenerate mesh, same code path);
* each chip runs the fused scoring+top-k kernel on its shard → partial
  (values, local indices);
* local indices are rebased to global row ids, partials are
  ``all_gather``-ed over ICI (tiny: D×Q×k values), and a final top-k
  merges them — replicated on every chip.

Also provides the sharded k-means step (the IVF coarse-quantizer
training step): data-parallel assignment on each shard + ``psum`` of
per-centroid sums/counts — this is the framework's "training step" and
what ``__graft_entry__.dryrun_multichip`` exercises.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from photo_search_engine_tpu.ops import quantized as quant_ops
from photo_search_engine_tpu.ops import topk as topk_ops

DATA_AXIS = "data"


def _shard_block_n(shard_rows: int) -> int:
    """Largest int8 kernel block that divides the shard capacity (so the
    per-shard pad inside shard_map is a no-op instead of a shard copy)."""
    for bn in (2048, 1024, 512, 256, 128):
        if shard_rows % bn == 0:
            return bn
    return None  # let int8_search pick (it will pad the shard)


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _local_topk(
    corpus_shard: jnp.ndarray,
    queries: jnp.ndarray,
    counts: jnp.ndarray,  # [n_shards] live rows per shard
    k: int,
    metric: str,
    impl: str,
    axis: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shard_id = jax.lax.axis_index(axis)
    shard_rows = corpus_shard.shape[0]
    count = counts[shard_id]
    k = min(k, shard_rows)  # a shard can contribute at most shard_rows hits
    if impl == "pallas":
        # the live-count mask must ride INSIDE the scan (padding rows score
        # 0 for ip and would displace real hits before any post-mask)
        vals, idx = topk_ops.exact_search(
            corpus_shard, queries, k, count=count, metric=metric, impl="pallas"
        )
        if metric == "l2":
            # merge ranks by descending score; exact_search returned
            # ascending distances (+inf for empty slots) — re-negate.
            empty = jnp.isposinf(vals)
            vals = jnp.where(empty, -jnp.inf, -vals)
    else:
        scores = jax.lax.dot_general(
            queries.astype(corpus_shard.dtype),
            corpus_shard,
            (((1,), (1,)), ((), ())),
            precision=topk_ops._dot_precision(corpus_shard.dtype),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            qn = jnp.sum(jnp.square(queries.astype(jnp.float32)), 1, keepdims=True)
            cn = jnp.sum(jnp.square(corpus_shard.astype(jnp.float32)), 1)[None, :]
            scores = -(qn + cn - 2.0 * scores)
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(rows < count, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k)
        idx = jnp.where(jnp.isneginf(vals), -1, idx)
    global_idx = jnp.where(idx >= 0, idx + shard_id * shard_rows, -1)
    return vals, global_idx


def _merge_partials(
    vals: jnp.ndarray, idx: jnp.ndarray, k: int, axis: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # all_gather over ICI: [n_shards, Q, k] — tiny payload
    all_vals = jax.lax.all_gather(vals, axis)
    all_idx = jax.lax.all_gather(idx, axis)
    n_shards, q, kk = all_vals.shape
    flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q, n_shards * kk)
    flat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, n_shards * kk)
    merged_vals, positions = jax.lax.top_k(flat_vals, k)
    merged_idx = jnp.take_along_axis(flat_idx, positions, axis=1)
    merged_idx = jnp.where(jnp.isneginf(merged_vals), -1, merged_idx)
    return merged_vals, merged_idx


def sharded_exact_search(
    corpus: jnp.ndarray,   # [n_shards * shard_rows, D] (row-sharded or host)
    queries: jnp.ndarray,  # [Q, D]
    k: int,
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,  # live rows per shard
    metric: str = "ip",
    impl: str = "auto",
    axis: str = DATA_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN over a row-sharded corpus; returns replicated
    (distances, global indices) with FAISS conventions."""
    n_shards = mesh.shape[axis]
    total_rows, dim = corpus.shape
    if total_rows % n_shards:
        raise ValueError(
            f"corpus rows {total_rows} must divide evenly over {n_shards} shards"
        )
    shard_rows = total_rows // n_shards
    if counts is None:
        counts_arr = jnp.full((n_shards,), shard_rows, jnp.int32)
    else:
        counts_arr = jnp.asarray(counts, jnp.int32)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "lax"
    queries = jnp.atleast_2d(queries)
    k = min(k, total_rows)
    kernel_metric = "ip" if metric == "cosine" else metric

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(corpus_shard, queries_rep, counts_rep):
        vals, idx = _local_topk(
            corpus_shard, queries_rep, counts_rep, k, kernel_metric, impl, axis
        )
        return _merge_partials(vals, idx, k, axis)

    vals, idx = jax.jit(run)(corpus, queries, counts_arr)
    if metric == "l2":
        empty = jnp.isneginf(vals)
        vals = jnp.where(empty, jnp.inf, -vals)
    return vals, idx


def sharded_int8_search(
    corpus_i8: jnp.ndarray,   # [n_shards * shard_rows, D] int8 (row-sharded)
    scales: jnp.ndarray,      # [n_shards * shard_rows] f32 per-row scales
    corpus_ref: jnp.ndarray,  # [n_shards * shard_rows, D] full-precision rows
    queries: jnp.ndarray,     # [Q, D] f32
    k: int,
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,
    metric: str = "ip",
    axis: str = DATA_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded int8-scan + exact-rescore k-NN (ops/quantized.py per shard,
    all_gather merge of the exactly-rescored partials over ICI).  Same
    conventions as ``sharded_exact_search``."""
    n_shards = mesh.shape[axis]
    total_rows, dim = corpus_i8.shape
    if total_rows % n_shards:
        raise ValueError(
            f"corpus rows {total_rows} must divide evenly over {n_shards} shards"
        )
    shard_rows = total_rows // n_shards
    if counts is None:
        counts_arr = jnp.full((n_shards,), shard_rows, jnp.int32)
    else:
        counts_arr = jnp.asarray(counts, jnp.int32)
    queries = jnp.atleast_2d(queries).astype(jnp.float32)
    k = min(k, total_rows)
    kernel_metric = "ip" if metric == "cosine" else metric
    block_n = _shard_block_n(shard_rows)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(i8_shard, scales_shard, ref_shard, queries_rep, counts_rep):
        shard_id = jax.lax.axis_index(axis)
        count = counts_rep[shard_id]
        k_local = min(k, shard_rows)
        vals, idx = quant_ops.int8_search(
            i8_shard,
            scales_shard,
            ref_shard,
            queries_rep,
            k_local,
            count=count,
            metric=kernel_metric,
            block_n=block_n,
        )
        if kernel_metric == "l2":
            # merge ranks by descending score; re-negate ascending distances
            empty = jnp.isposinf(vals)
            vals = jnp.where(empty, -jnp.inf, -vals)
        global_idx = jnp.where(idx >= 0, idx + shard_id * shard_rows, -1)
        return _merge_partials(vals, global_idx, k, axis)

    vals, idx = jax.jit(run)(corpus_i8, scales, corpus_ref, queries, counts_arr)
    if metric == "l2":
        empty = jnp.isneginf(vals)
        vals = jnp.where(empty, jnp.inf, -vals)
    return vals, idx


def sharded_kmeans_step(
    corpus: jnp.ndarray,     # [rows, D] row-sharded over mesh
    centroids: jnp.ndarray,  # [nlist, D] replicated
    mesh: Mesh,
    *,
    counts: Optional[np.ndarray] = None,
    axis: str = DATA_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Lloyd iteration, data-parallel: local assignment on each shard,
    ``psum`` of per-centroid sums/counts over ICI, replicated update.
    Empty centroids keep their previous position.

    Returns (new_centroids [nlist, D] f32, assignment_counts [nlist])."""
    n_shards = mesh.shape[axis]
    total_rows, dim = corpus.shape
    if total_rows % n_shards:
        raise ValueError("corpus rows must divide evenly over shards")
    shard_rows = total_rows // n_shards
    nlist = centroids.shape[0]
    if counts is None:
        counts_arr = jnp.full((n_shards,), shard_rows, jnp.int32)
    else:
        counts_arr = jnp.asarray(counts, jnp.int32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(corpus_shard, cents, counts_rep):
        shard_id = jax.lax.axis_index(axis)
        live = counts_rep[shard_id]
        x = corpus_shard.astype(jnp.float32)
        scores = jax.lax.dot_general(
            x, cents.astype(jnp.float32), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        cn = jnp.sum(jnp.square(cents.astype(jnp.float32)), axis=1)[None, :]
        # nearest by (squared) L2: argmax of 2<x,c> - |c|^2
        assign = jnp.argmax(2.0 * scores - cn, axis=1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0],), 0)
        valid = rows < live
        onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)
        onehot = onehot * valid[:, None].astype(jnp.float32)
        local_sums = jax.lax.dot_general(
            onehot, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [nlist, D]
        local_counts = jnp.sum(onehot, axis=0)  # [nlist]
        sums = jax.lax.psum(local_sums, axis)
        totals = jax.lax.psum(local_counts, axis)
        new_cents = jnp.where(
            totals[:, None] > 0, sums / jnp.maximum(totals[:, None], 1.0),
            cents.astype(jnp.float32),
        )
        return new_cents, totals

    return jax.jit(step)(corpus, centroids, counts_arr)


class ShardedEmbeddingStore:
    """Row-sharded corpus placed over a mesh with the search entry point.

    Capacity per shard stays equal (padding rows masked via per-shard
    counts), so appends never re-layout existing shards: new rows go to
    the shard with the fewest live rows (round-robin fill)."""

    def __init__(
        self,
        dimension: int,
        mesh: Optional[Mesh] = None,
        *,
        metric: str = "cosine",
        store_dtype: str = "float32",
        shard_block: int = 1024,
        quantized: bool = False,
    ) -> None:
        self.dimension = int(dimension)
        self.mesh = mesh or make_mesh()
        self.metric = metric
        self.store_dtype = jnp.dtype(store_dtype)
        self.shard_block = int(shard_block)
        self.quantized = bool(quantized)
        self.n_shards = self.mesh.shape[DATA_AXIS]
        self._host_shards = [
            np.zeros((0, self.dimension), np.float32) for _ in range(self.n_shards)
        ]
        self._device: Optional[jnp.ndarray] = None
        self._device_i8: Optional[jnp.ndarray] = None
        self._scales: Optional[jnp.ndarray] = None
        self._dirty = True

    @property
    def counts(self) -> np.ndarray:
        return np.array([shard.shape[0] for shard in self._host_shards], np.int32)

    @property
    def count(self) -> int:
        return int(self.counts.sum())

    # Stable id encoding: shard * _ID_STRIDE + local row.  Independent of
    # the (growing) device capacity, so ids stored by callers stay valid
    # across appends and re-syncs.
    _ID_STRIDE = 1 << 40

    def append(self, vectors: np.ndarray) -> np.ndarray:
        """Append rows; returns stable global row ids."""
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        if self.metric == "cosine":
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            vectors = np.where(norms > 0, vectors / np.maximum(norms, 1e-30), vectors)
        ids = []
        for row in vectors:
            target = int(np.argmin(self.counts))
            local = self._host_shards[target].shape[0]
            self._host_shards[target] = np.concatenate(
                [self._host_shards[target], row[None, :]]
            )
            ids.append(target * self._ID_STRIDE + local)
        self._dirty = True
        return np.asarray(ids, np.int64)

    def _shard_capacity_hint(self) -> int:
        rows = max((s.shape[0] for s in self._host_shards), default=0)
        return max(self.shard_block, -(-rows // self.shard_block) * self.shard_block)

    def _sync(self) -> Tuple[jnp.ndarray, int]:
        capacity = self._shard_capacity_hint()
        if self._dirty or self._device is None or self._device.shape[0] != capacity * self.n_shards:
            stacked = np.zeros(
                (self.n_shards * capacity, self.dimension), np.float32
            )
            for shard_id, shard in enumerate(self._host_shards):
                stacked[shard_id * capacity : shard_id * capacity + shard.shape[0]] = shard
            sharding = NamedSharding(self.mesh, P(DATA_AXIS, None))
            self._device = jax.device_put(
                jnp.asarray(stacked, self.store_dtype), sharding
            )
            if self.quantized:
                absmax = np.abs(stacked).max(axis=1, keepdims=True)
                scale = absmax / 127.0
                q = np.clip(
                    np.round(stacked / np.maximum(scale, 1e-30)), -127, 127
                ).astype(np.int8)
                self._device_i8 = jax.device_put(jnp.asarray(q), sharding)
                self._scales = jax.device_put(
                    jnp.asarray(scale[:, 0], jnp.float32),
                    NamedSharding(self.mesh, P(DATA_AXIS)),
                )
            self._dirty = False
        return self._device, capacity

    def search(
        self, queries: np.ndarray, k: int, impl: str = "auto"
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances, stable global row ids); -1 for empty slots."""
        if self.count == 0:
            q = np.atleast_2d(queries).shape[0]
            return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
        corpus, capacity = self._sync()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = np.where(norms > 0, queries / np.maximum(norms, 1e-30), queries)
        if impl == "int8":
            if not self.quantized:
                raise ValueError(
                    "impl='int8' requires ShardedEmbeddingStore(quantized=True)"
                )
            vals, idx = sharded_int8_search(
                self._device_i8,
                self._scales,
                corpus,
                jnp.asarray(queries, jnp.float32),
                min(k, self.count),
                self.mesh,
                counts=self.counts,
                metric=self.metric,
            )
        else:
            vals, idx = sharded_exact_search(
                corpus,
                jnp.asarray(queries, self.store_dtype),
                min(k, self.count),
                self.mesh,
                counts=self.counts,
                metric=self.metric,
                impl=impl,
            )
        # rebase transient (capacity-relative) device indices to stable ids
        raw = np.asarray(idx, np.int64)
        shard = raw // capacity
        local = raw % capacity
        stable = np.where(raw >= 0, shard * self._ID_STRIDE + local, -1)
        return np.asarray(vals), stable

    def global_id_to_shard_local(self, global_id: int) -> Tuple[int, int]:
        return global_id // self._ID_STRIDE, global_id % self._ID_STRIDE

    def reconstruct(self, global_id: int) -> np.ndarray:
        shard_id, local = self.global_id_to_shard_local(int(global_id))
        return self._host_shards[shard_id][local].copy()

    # ------------------------------------------------------------------
    # Checkpoint / resume (SURVEY.md §5: the TPU-scale analogue of the
    # reference's FAISS-binary + sidecar persistence — one .npy per shard
    # plus a manifest, so multi-host deployments can write/read shards in
    # parallel and resume with per-shard granularity.)
    # ------------------------------------------------------------------
    def save(self, directory: str, *, format: str = "npy") -> None:
        import json
        import os

        os.makedirs(directory, exist_ok=True)
        if format == "orbax":
            self._save_orbax(directory)
        elif format == "npy":
            for shard_id, shard in enumerate(self._host_shards):
                with open(
                    os.path.join(directory, f"shard_{shard_id:04d}.npy"), "wb"
                ) as f:
                    np.save(f, shard)
        else:
            raise ValueError("format must be npy or orbax")
        manifest = {
            "format_version": 1,
            "format": format,
            "dimension": self.dimension,
            "metric": self.metric,
            "store_dtype": str(self.store_dtype),
            "shard_block": self.shard_block,
            "n_shards": self.n_shards,
            "counts": self.counts.tolist(),
        }
        with open(os.path.join(directory, "manifest.json"), "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)

    # Orbax/tensorstore path: writes the DEVICE-RESIDENT sharded array
    # directly (each host writes its own shards in a multi-host deployment,
    # no host gather) — the TPU-idiomatic checkpoint layer (SURVEY.md §5).
    # The .npy path stays the default: exact f32, no extra deps on read.
    def _orbax_dir(self, directory: str) -> str:
        import os

        return os.path.join(os.path.abspath(directory), "corpus_orbax")

    def _save_orbax(self, directory: str) -> None:
        import orbax.checkpoint as ocp

        corpus, _ = self._sync()
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as checkpointer:
            checkpointer.save(
                self._orbax_dir(directory),
                {"corpus": corpus},
                force=True,
            )

    def _load_orbax_shards(self, directory, saved_shards, counts):
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as checkpointer:
            restored = checkpointer.restore(self._orbax_dir(directory))
        corpus = np.asarray(restored["corpus"], np.float32)
        if saved_shards <= 0 or corpus.shape[0] % saved_shards:
            raise ValueError("orbax checkpoint shape inconsistent with manifest")
        capacity = corpus.shape[0] // saved_shards
        shards = []
        for shard_id in range(saved_shards):
            live = int(counts[shard_id]) if shard_id < len(counts) else capacity
            start = shard_id * capacity
            shards.append(
                np.ascontiguousarray(corpus[start : start + live], np.float32)
            )
        return shards

    def load(self, directory: str) -> bool:
        import json
        import os

        manifest_path = os.path.join(directory, "manifest.json")
        if not os.path.exists(manifest_path):
            return False
        with open(manifest_path, "r", encoding="utf-8") as f:
            manifest = json.load(f)
        if manifest.get("dimension") != self.dimension:
            raise ValueError("checkpoint dimension differs; rebuild the store")
        saved_shards = int(manifest.get("n_shards", 0))
        counts = manifest.get("counts") or []
        if manifest.get("format") == "orbax":
            shards = self._load_orbax_shards(directory, saved_shards, counts)
        else:
            shards = []
            for shard_id in range(saved_shards):
                path = os.path.join(directory, f"shard_{shard_id:04d}.npy")
                if not os.path.exists(path):
                    raise ValueError(f"checkpoint shard missing: {path}")
                with open(path, "rb") as f:
                    shards.append(np.load(f))
        for shard, count in zip(shards, counts):
            if shard.shape[0] != count:
                raise ValueError("checkpoint shard count mismatch; rebuild")
        if saved_shards == self.n_shards:
            self._host_shards = shards
        else:
            # re-shard: mesh size changed between save and load
            rows = np.concatenate([s for s in shards if s.size]) if shards else \
                np.zeros((0, self.dimension), np.float32)
            self._host_shards = [
                np.zeros((0, self.dimension), np.float32) for _ in range(self.n_shards)
            ]
            if rows.size:
                splits = np.array_split(rows, self.n_shards)
                self._host_shards = [np.ascontiguousarray(s, np.float32) for s in splits]
        self._dirty = True
        return True
