"""Sharded IVF: cluster-pruned ANN over a row-sharded corpus.

The multi-chip million-scale path: GLOBAL centroids trained data-parallel
over the mesh (``sharded_kmeans_step`` — psum of per-centroid sums over
ICI), a PER-SHARD cluster-major layout of each shard's own rows, the
scalar-prefetch probe kernel (models/ivf.py ``_ivf_pallas``) running on
every shard inside one ``shard_map``, and the same all_gather merge of
per-shard partial top-k the exact sharded path uses.  Probing is
replicated work (queries × global centroids — identical on every chip,
a few microseconds), so the only cross-chip traffic is the tiny [Q, k]
partials.

The reference has no counterpart (FAISS sharding is an app-level concern
there; SURVEY.md §2 "Parallelism strategies": net-new design).  Metrics:
ip/cosine and l2 (scores merge across shards in the rank-consistent
2<q,c> − |c|² space; |q|² is restored after the ICI merge).  Masked
(per-row filtered) probing IS supported: the
filter bits permute into each shard's slot layout, fold into the kernel's
row-validity operand inside the shard_map, and the probe width inflates
by ~1/selectivity — the same recipe as the single-device
models/ivf.py:939-950, so ``index_type=ivf`` keeps cluster pruning under
time filters on a mesh (the reference composes ES filters with ANN
recall — utils/keyword_store.py:286-392, core/searcher.py:814-817).
"""

from __future__ import annotations

import functools
import hashlib
import threading
from collections import OrderedDict
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from photo_search_engine_tpu.models.ivf import (
    _ivf_pallas,
    _round_up,
    balanced_layout,
    bucket_queries,
)
from photo_search_engine_tpu.parallel.sharded import (
    DATA_AXIS,
    ShardedEmbeddingStore,
    _merge_partials,
    _stage,
    sharded_kmeans_step,
)

_LANE = 128


def _host_assign_top3(
    rows: np.ndarray, cents: np.ndarray, chunk: int = 65_536
) -> np.ndarray:
    """Top-3 nearest centroids per row, host-side numpy (chunked).

    Deliberately NOT the device ``assign_clusters``: build() runs inside
    the driver's multichip dryrun, which must never place an op on the
    default backend (it may be a broken TPU plugin — __graft_entry__.py).
    """
    nlist = cents.shape[0]
    cn = (cents.astype(np.float32) ** 2).sum(1)[None, :]
    out = np.empty((rows.shape[0], 3), np.int64)
    for i in range(0, rows.shape[0], chunk):
        part = rows[i : i + chunk].astype(np.float32)
        adj = 2.0 * (part @ cents.T) - cn
        if nlist <= 3:
            top = np.argsort(-adj, axis=1)
            top = np.concatenate([top] * 3, axis=1)[:, :3]
        else:
            top = np.argpartition(-adj, 3, axis=1)[:, :3]
            order = np.take_along_axis(adj, top, 1).argsort(1)[:, ::-1]
            top = np.take_along_axis(top, order, 1)
        out[i : i + chunk] = top
    return out


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_sharded(layout, valid, slots, rows):
    """Donated in-place update of the sharded layout + validity — GSPMD
    routes each update to the shard owning its slot; no full re-upload."""
    return (
        layout.at[slots].set(rows.astype(layout.dtype)),
        valid.at[slots].set(1),
    )


class ShardedIVFIndex:
    """Cluster-pruned search over a :class:`ShardedEmbeddingStore`.

    ``search`` returns ``(distances, stable_ids)`` with the store's
    stable id convention (``shard * 2^40 + local``), so callers resolve
    hits exactly like sharded exact results.
    """

    def __init__(
        self,
        mesh,
        centroids: np.ndarray,        # [nlist, dp] f32 (zero-padded dims)
        layout_dev: jnp.ndarray,      # [n_shards * nlist * L, dp] sharded
        row_valid_dev: jnp.ndarray,   # [n_shards * nlist * L] int32 sharded
        perms: List[np.ndarray],      # per shard [nlist * L] local row or -1
        nlist: int,
        lrows: int,
        dim: int,
        built_counts: np.ndarray,     # per-shard live rows at build time
        metric: str = "cosine",
    ) -> None:
        self.mesh = mesh
        self.axis = DATA_AXIS
        self.n_shards = mesh.shape[DATA_AXIS]
        self.nlist = nlist
        self.lrows = lrows
        self.dim = dim
        self.dp = centroids.shape[1]
        self.centroids = centroids
        self.metric = metric
        self._cents_dev = _stage(mesh, centroids, P(), np.float32)
        self._layout = layout_dev
        self._row_valid = row_valid_dev
        # single [n_shards, span] matrix: search indexes it directly and
        # append mutates rows in place (no per-search np.stack copy)
        self.perms = np.stack(perms) if isinstance(perms, list) else perms
        self.built_counts = np.asarray(built_counts, np.int64)
        self._search_cache = {}
        # [n_shards * span] squared row norms of the layout, sharded — the
        # l2 kernel operand (lazily computed; None for ip/cosine)
        self._cnorms_dev = None
        # staged device slot masks, LRU by content digest (the mesh twin of
        # IVFIndex._slot_mask's cache — repeated filters skip the host→mesh
        # restage)
        self._mask_lru: "OrderedDict" = OrderedDict()
        self._MASK_LRU_SIZE = 16
        # pipelined micro-batches hit this LRU from concurrent threads
        self._mask_lru_lock = threading.Lock()

    # -- build ------------------------------------------------------------
    @classmethod
    def build(
        cls,
        store: ShardedEmbeddingStore,
        nlist: int,
        *,
        train_iters: int = 8,
        slack: float = 1.5,
        seed: int = 0,
    ) -> "ShardedIVFIndex":
        if store.metric not in ("cosine", "ip", "l2"):
            raise ValueError("sharded IVF supports ip/cosine/l2")
        mesh = store.mesh
        n_shards = store.n_shards
        dim = store.dimension
        counts = store.counts.astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            raise ValueError("cannot build sharded IVF on an empty store")
        nlist = max(1, min(int(nlist), total))
        rng = np.random.default_rng(seed)

        # ---- global centroids: data-parallel Lloyd over the mesh --------
        # Reuse the store's own row-sharded device buffer (_sync stages it
        # to the mesh and never touches the default backend) instead of
        # host-stacking a second padded copy of the corpus.
        stacked_dev, _cap = store._sync()
        pool = np.concatenate([r for r in store._host_shards if r.shape[0]])
        cents_dev = pool[rng.choice(total, size=nlist, replace=False)].astype(
            np.float32
        )
        for _ in range(train_iters):
            cents_dev, _ = sharded_kmeans_step(
                stacked_dev, cents_dev, mesh, counts=counts.astype(np.int32),
            )
        cents = np.asarray(cents_dev, np.float32)

        # ---- per-shard cluster-major layouts (common capacity L) --------
        ranked = [
            _host_assign_top3(rows, cents)
            if rows.shape[0]
            else np.zeros((0, 3), np.int64)
            for rows in store._host_shards
        ]
        placed = [
            balanced_layout(r, nlist, slack=slack)
            if r.shape[0]
            else (None, np.full(nlist, -1, np.int64), 1)
            for r in ranked
        ]
        lrows = _round_up(max(p[2] for p in placed), _LANE)
        dp = _round_up(dim, _LANE)
        dtype = store.store_dtype
        layout = np.zeros((n_shards, nlist * lrows, dp), np.float32)
        valid = np.zeros((n_shards, nlist * lrows), np.int32)
        perms: List[np.ndarray] = []
        for s, (_, perm_s, cap_s) in enumerate(placed):
            perm = np.full(nlist * lrows, -1, np.int64)
            if perm_s.shape[0] == nlist * cap_s:
                # re-space cluster-major [nlist, cap_s] → [nlist, lrows]
                perm.reshape(nlist, lrows)[:, :cap_s] = perm_s.reshape(
                    nlist, cap_s
                )
            live = perm >= 0
            rows_s = store._host_shards[s]
            if rows_s.shape[0]:
                layout[s, live, :dim] = rows_s[perm[live]]
            valid[s, live] = 1
            perms.append(perm)

        layout_dev = _stage(
            mesh, layout.reshape(n_shards * nlist * lrows, dp),
            P(DATA_AXIS, None), dtype,
        )
        valid_dev = _stage(
            mesh, valid.reshape(n_shards * nlist * lrows), P(DATA_AXIS),
            np.int32,
        )
        cents_p = np.zeros((nlist, dp), np.float32)
        cents_p[:, :dim] = cents
        return cls(
            mesh, cents_p, layout_dev, valid_dev, perms, nlist, lrows, dim,
            counts, metric=store.metric,
        )

    # -- persistence -------------------------------------------------------
    def state(self) -> dict:
        """Host-side trained state (centroids + per-shard perms + shape) —
        the mesh twin of ``IVFIndex.state``.  The sharded layout arrays are
        NOT included: ``from_state`` re-gathers them from the store's host
        shards through the perms (a deterministic permutation), so restoring
        skips the expensive parts (data-parallel k-means + assignment +
        placement) and pays only the layout upload."""
        return {
            "centroids": self.centroids,           # [nlist, dp] padded
            "perms": self.perms,                   # [n_shards, nlist*lrows]
            "nlist": np.int64(self.nlist),
            "lrows": np.int64(self.lrows),
            "dim": np.int64(self.dim),
            "built_counts": self.built_counts,
            "metric": self.metric,
        }

    @classmethod
    def from_state(
        cls, store: ShardedEmbeddingStore, state: dict
    ) -> "ShardedIVFIndex":
        """Restore from ``state()`` + a store re-appended in the same
        insertion order (shard placement is deterministic, so each perm's
        local row indices remain valid — validated against the store's
        per-shard counts)."""
        mesh = store.mesh
        n_shards = store.n_shards
        nlist = int(state["nlist"])
        lrows = int(state["lrows"])
        dim = int(state["dim"])
        perms = np.asarray(state["perms"], np.int64)
        built_counts = np.asarray(state["built_counts"], np.int64)
        if perms.shape != (n_shards, nlist * lrows):
            raise ValueError("sharded IVF state shape mismatch with mesh")
        if dim != store.dimension:
            raise ValueError("sharded IVF state dimension mismatch")
        counts = store.counts.astype(np.int64)
        for s in range(n_shards):
            live = perms[s] >= 0
            if live.any() and int(perms[s][live].max()) >= int(counts[s]):
                raise ValueError(
                    "sharded IVF state references rows beyond shard "
                    f"{s} ({int(counts[s])} rows)"
                )
        dp = _round_up(dim, _LANE)
        layout = np.zeros((n_shards, nlist * lrows, dp), np.float32)
        valid = np.zeros((n_shards, nlist * lrows), np.int32)
        for s in range(n_shards):
            live = perms[s] >= 0
            rows_s = store._host_shards[s]
            if rows_s.shape[0]:
                layout[s, live, :dim] = rows_s[perms[s][live]]
            valid[s, live] = 1
        layout_dev = _stage(
            mesh, layout.reshape(n_shards * nlist * lrows, dp),
            P(DATA_AXIS, None), store.store_dtype,
        )
        valid_dev = _stage(
            mesh, valid.reshape(n_shards * nlist * lrows), P(DATA_AXIS),
            np.int32,
        )
        cents = np.asarray(state["centroids"], np.float32)
        return cls(
            mesh, cents, layout_dev, valid_dev, perms, nlist, lrows, dim,
            built_counts, metric=str(state.get("metric", store.metric)),
        )

    # -- incremental append ----------------------------------------------
    def append(self, rows: np.ndarray, stable_ids: np.ndarray) -> bool:
        """FAISS ``IndexIVF.add`` analogue on the mesh: assign each new row
        to its nearest TRAINED centroid and scatter it into a free layout
        slot of that cluster within the row's own shard (the stable id
        encodes the shard — rows were already placed by the store's
        balanced fill).  Returns False when a target cluster is full in
        that shard (caller falls back to the retrain+re-layout rebuild);
        partial perm mutations are harmless because the rebuild replaces
        the whole index."""
        rows = np.atleast_2d(np.asarray(rows, np.float32))
        stable_ids = np.asarray(stable_ids, np.int64)
        if rows.shape[0] == 0:
            return True
        if self.metric == "cosine":
            # the store normalizes ITS copy on append; normalize ours too,
            # or an unnormalized caller row would carry an inflated IP
            # score in the layout and corrupt ranking
            norms = np.linalg.norm(rows, axis=1, keepdims=True)
            rows = np.where(norms > 0, rows / np.maximum(norms, 1e-30), rows)
        top = _host_assign_top3(rows, self.centroids[:, : self.dim])
        span = self.nlist * self.lrows
        slots = np.empty(rows.shape[0], np.int64)
        for i in range(rows.shape[0]):
            shard = int(stable_ids[i] // ShardedEmbeddingStore._ID_STRIDE)
            local = int(stable_ids[i] % ShardedEmbeddingStore._ID_STRIDE)
            perm = self.perms[shard]
            placed = False
            for c in top[i]:
                base = int(c) * self.lrows
                free = np.flatnonzero(perm[base : base + self.lrows] < 0)
                if free.size:
                    slot = base + int(free[0])
                    perm[slot] = local
                    slots[i] = shard * span + slot
                    placed = True
                    break
            if not placed:
                return False
        rows_p = np.zeros((rows.shape[0], self.dp), np.float32)
        rows_p[:, : self.dim] = rows
        self._layout, self._row_valid = _scatter_sharded(
            self._layout,
            self._row_valid,
            _stage(self.mesh, slots.astype(np.int32), P(), np.int32),
            _stage(self.mesh, rows_p, P(), np.float32),
        )
        per_shard = np.bincount(
            (stable_ids // ShardedEmbeddingStore._ID_STRIDE).astype(np.int64),
            minlength=self.n_shards,
        )
        self.built_counts = self.built_counts + per_shard
        self._cnorms_dev = None  # l2 norm cache covers the old rows only
        return True

    # -- search -----------------------------------------------------------
    def _cnorms(self) -> jnp.ndarray:
        """[n_shards * span] squared layout-row norms, row-sharded (the l2
        kernel operand) — computed on the mesh, invalidated by appends."""
        if self._cnorms_dev is None:
            self._cnorms_dev = jax.jit(
                lambda x: jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1)
            )(self._layout)
        return self._cnorms_dev

    def _program(
        self, k: int, bq: int, qp: int, nprobe: int, s_max: int,
        has_mask: bool = False,
    ):
        # the live query count rides as a dynamic scalar operand, so the
        # compiled-program key depends only on BUCKETED shapes (a static q
        # re-specialized the program per organic batch size — one
        # multi-second compile per size under serving traffic)
        key = (k, bq, qp, nprobe, s_max, has_mask)
        cached = self._search_cache.get(key)
        if cached is not None:
            return cached
        axis = self.axis
        mesh = self.mesh
        is_l2 = self.metric == "l2"
        nlist, lrows, dp = self.nlist, self.lrows, self.dp
        # a shard can contribute at most its span of rows; n_shards*k_local
        # >= k is guaranteed (k is clamped to the live total), so the merge
        # still yields the exact global top-k
        k_local = min(k, nlist * lrows)
        # VMEM guard mirroring IVFIndex.search (models/ivf.py:934-942): the
        # kernel double-buffers one whole cluster block plus the probe
        # matrix; oversized layouts take the dense fallback instead of
        # failing Mosaic lowering on the real chip
        itemsize = jnp.dtype(self._layout.dtype).itemsize
        block_bytes = 2 * lrows * dp * itemsize
        probe_bytes = 2 * 128 * nlist * 4
        use_kernel = (
            jax.default_backend() == "tpu"
            and block_bytes + probe_bytes <= 12 * 1024 * 1024
        )

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis), P(), P(), P())
            + ((P(axis),) if has_mask else ())
            + ((P(axis),) if is_l2 else ()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run(layout_shard, valid_shard, cents, queries_rep, q_live, *rest):
            rest = list(rest)
            if has_mask:
                # per-shard slot-permuted filter bits × row validity: the
                # mask rides INSIDE the probe kernel, so cluster pruning
                # survives filtered queries (models/ivf.py:939-950 per shard)
                valid_shard = valid_shard * rest.pop(0)
            # l2 kernel operand: squared layout-row norms of this shard.
            # Scores merge in 2<q,c> - |c|² space (the per-query |q|² is
            # rank-invariant and subtracted after the cross-shard merge)
            cn_shard = rest.pop(0)[None, :] if is_l2 else None
            # stage 1 (replicated math, identical on every shard): rank
            # clusters by nearest centroid — matches assignment geometry
            qf = queries_rep.astype(jnp.float32)
            scores = jax.lax.dot_general(
                qf, cents, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cn = jnp.sum(jnp.square(cents), axis=1)[None, :]
            _, probe_ids = jax.lax.top_k(2.0 * scores - cn, nprobe)
            probe_matrix = jnp.zeros((qp, nlist), jnp.int32)
            probe_matrix = jax.vmap(lambda row, ids: row.at[ids].set(1))(
                probe_matrix, probe_ids
            )
            # zero the padded query rows: they would otherwise probe the
            # smallest-norm centroids and inflate the stage-2 union by up
            # to qp/q on the single-query serving path
            row_live = (
                jax.lax.broadcasted_iota(jnp.int32, (qp, 1), 0) < q_live[0, 0]
            ).astype(jnp.int32)
            probe_matrix = probe_matrix * row_live
            any_probe = jnp.sum(probe_matrix, axis=0)
            selected = jnp.argsort(-any_probe)[:s_max].astype(jnp.int32)
            sel_count = jnp.reshape(
                jnp.sum((any_probe > 0).astype(jnp.int32)), (1, 1)
            )

            valid_row = valid_shard[None, :]
            if use_kernel:
                vals, slots = _ivf_pallas(
                    layout_shard,
                    queries_rep.astype(layout_shard.dtype),
                    selected, sel_count, probe_matrix, valid_row,
                    cn_shard
                    if is_l2
                    else jnp.zeros((1, nlist * lrows), jnp.float32),
                    jnp.ones((qp, 1), jnp.float32),
                    jnp.ones((1, nlist * lrows), jnp.float32),
                    k_local, bq, lrows, s_max,
                    interpret=False, metric="l2" if is_l2 else "ip",
                    int8=False,
                )
                vals = vals[:, :k_local]
                slots = slots[:, :k_local]
            else:
                # dense fallback (CPU mesh tests + VMEM-guarded layouts):
                # same probe semantics, scores masked to probed clusters +
                # valid slots
                full = jax.lax.dot_general(
                    qf, layout_shard.astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if is_l2:
                    full = 2.0 * full - cn_shard
                cluster_of_slot = (
                    jax.lax.broadcasted_iota(jnp.int32, (nlist * lrows,), 0)
                    // lrows
                )
                probed = jnp.take(probe_matrix, cluster_of_slot, axis=1)
                keep = jnp.logical_and(probed > 0, valid_row > 0)
                full = jnp.where(keep, full, -jnp.inf)
                vals, slots = jax.lax.top_k(full, k_local)
            shard_id = jax.lax.axis_index(axis)
            empty = jnp.isneginf(vals)
            slots = jnp.where(empty, -1, slots + shard_id * (nlist * lrows))
            return _merge_partials(vals, slots, k, axis)

        jitted = jax.jit(run)
        self._search_cache[key] = jitted
        return jitted

    def _stage_mask(self, slot_mask: np.ndarray) -> jnp.ndarray:
        """[n_shards * span] int32 slot mask → sharded device array,
        LRU-cached by content digest."""
        bits = np.ascontiguousarray(slot_mask, np.int32)
        key = (
            hashlib.blake2b(bits.tobytes(), digest_size=16).digest(),
            bits.shape[0],
        )
        with self._mask_lru_lock:
            cached = self._mask_lru.get(key)
            if cached is not None:
                self._mask_lru.move_to_end(key)
                return cached
        dev = _stage(self.mesh, bits, P(DATA_AXIS), np.int32)
        with self._mask_lru_lock:
            self._mask_lru[key] = dev
            while len(self._mask_lru) > self._MASK_LRU_SIZE:
                self._mask_lru.popitem(last=False)
        return dev

    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int,
        *,
        slot_mask: Optional[np.ndarray] = None,  # [n_shards * span] slot bits
        mask_ratio: Optional[float] = None,      # live-slot selectivity
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Probed k-NN; returns (scores desc — ascending positive squared
        distances for l2 — and stable ids) with -1 padding.

        ``slot_mask`` filters rows WITHOUT losing cluster pruning: bits are
        already permuted into the sharded slot layout (the caller maps
        insertion/stable order through ``perms`` — MeshIVFAdapter), they
        fold into each shard's row-validity operand, and the probe width
        inflates by ~1/selectivity (IVFIndex._inflate_nprobe)."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        q, dim = queries.shape
        if dim != self.dim:
            raise ValueError(f"dimension mismatch: {dim} != {self.dim}")
        total = int(self.built_counts.sum())
        k = max(1, min(int(k), total))
        nprobe = max(1, min(int(nprobe), self.nlist))
        if slot_mask is not None:
            from photo_search_engine_tpu.models.ivf import IVFIndex

            if mask_ratio is None:
                mask_ratio = float(np.asarray(slot_mask).sum()) / max(
                    int(self.built_counts.sum()), 1
                )
            nprobe = IVFIndex._inflate_nprobe(nprobe, mask_ratio, self.nlist)
        bq = min(128, bucket_queries(q))
        qp = _round_up(q, bq)
        # s_max from the BUCKETED count keeps the program key shape-stable
        s_max = min(self.nlist, qp * nprobe)
        q_pad = np.zeros((qp, self.dp), np.float32)
        q_pad[:q, : self.dim] = queries
        run = self._program(
            k, bq, qp, nprobe, s_max, has_mask=slot_mask is not None
        )
        args = (
            self._layout, self._row_valid, self._cents_dev,
            _stage(self.mesh, q_pad, P(), np.float32),
            _stage(self.mesh, np.full((1, 1), q, np.int32), P(), np.int32),
        )
        if slot_mask is not None:
            args = args + (self._stage_mask(slot_mask),)
        if self.metric == "l2":
            args = args + (self._cnorms(),)
        vals, slots = run(*args)
        vals = np.asarray(vals)[:q]
        slots = np.asarray(slots)[:q]
        if self.metric == "l2":
            # kernels merged in 2<q,c> - |c|² space; restore ascending
            # positive squared distances (the sharded exact convention)
            qn = np.sum(np.square(queries), axis=1, keepdims=True)
            vals = np.where(np.isneginf(vals), np.inf, qn - vals)
        # slot → (shard, local slot) → stable id via the shard's perm
        span = self.nlist * self.lrows
        ids = np.full(slots.shape, -1, np.int64)
        live = slots >= 0
        shard = slots[live] // span
        local_slot = slots[live] % span
        local_row = self.perms[shard, local_slot]
        ids[live] = shard.astype(np.int64) * ShardedEmbeddingStore._ID_STRIDE + local_row
        return vals, ids
