"""SPMD request fan-in: multi-host serving behind one HTTP listener.

DESIGN.md §3 documents the SPMD serving model: every JAX controller in a
``jax.distributed`` job holds replicated host state (metadata, config)
and process-local device shards, and every device-entering computation
must be entered by ALL controllers in the same order.  This module
implements the fan-in that makes that true for the real serving surface:

* ``SPMDVectorIndex`` — a ``VectorIndex`` whose device-entering entry
  points (``_route_search``, ``raw_grouped_search_batch``,
  ``add_batch``) broadcast an op descriptor + payload from rank 0 to
  every controller (``multihost_utils.broadcast_one_to_all``, i.e. the
  same collective tier the mesh kernels ride) before executing.  Host-only
  methods (metadata resolution, ``reconstruct`` from the host mirror,
  persistence) stay local and divergence-safe.
* ``SPMDVectorIndex.follow()`` — the follower loop run by every non-zero
  rank: receive an op, replay the identical call on the local replica,
  repeat until rank 0 broadcasts shutdown.  Because every replayed call
  is the same jitted computation in the same order, XLA's collectives
  (ICI within a host, DCN across hosts) line up by construction.

Rank 0 is therefore free to run the ENTIRE single-host serving stack —
Searcher, micro-batcher, WSGI app, HTTP listener — unchanged: any
``VectorIndex`` call it makes is transparently fanned out.  The reference
has no analogue (single process, reference main.py:333-362); this is the
TPU-native scale-out of its serving loop.

Payload protocol (two broadcasts per op, shapes derived from a fixed
header so followers never need out-of-band metadata):

  header  int64[8]: op, a, b, c, d, e (op-specific dims/flags)
  payload op-specific arrays, dtypes/shapes fully determined by header

Ops: 0 shutdown · 1 search(queries[Q,D], k, mask?[N]) ·
2 grouped(queries[Q,D], k, table[M,N], ids[Q]) ·
3 add_batch(embeddings[B,D], metadata-JSON bytes) ·
4 reload (replay ``load()`` from the shared index files) ·
5 clear

Ops 4/5 are host-state ops, broadcast so replicas never diverge: every
rank re-reads the SAME index files (multi-host deployments put DATA_DIR
on a shared filesystem — the same assumption the reference makes for its
FAISS index directory, reference utils/vector_store.py:239-249), so a
rank-0 ``load()``/``clear()`` (e.g. the /init_index force-rebuild path)
leaves all ranks with identical host mirrors before the next device op.
"""

from __future__ import annotations

import json
import threading
from typing import Any, Dict, List, Optional

import numpy as np

from photo_search_engine_tpu.core.vector_index import VectorIndex

_OP_SHUTDOWN = 0
_OP_SEARCH = 1
_OP_GROUPED = 2
_OP_ADD = 3
_OP_RELOAD = 4
_OP_CLEAR = 5


def _broadcast(value: np.ndarray) -> np.ndarray:
    """Rank-0 → all broadcast of one array (all ranks pass matching
    shape/dtype; non-source values are ignored)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(value))


class SPMDVectorIndex(VectorIndex):
    """``VectorIndex`` with rank-0 fan-in over a multi-controller mesh.

    Rank 0 calls the normal API (from HTTP routes / Searcher /
    micro-batcher); followers sit in :meth:`follow` replaying.  On a
    single-process runtime every broadcast is the identity, so this class
    degrades to a plain ``VectorIndex`` — the same code path at 1 host.

    Scope: flat exact / int8 / masked / grouped / IVF routes.  The lazy
    ``_ensure_ivf`` build is deterministic from the replicated host
    mirror (fixed k-means seed), so every rank trains the identical
    index — ``parallel/multihost.py`` ``launch_app_dryrun`` deploys an
    ``index_type=ivf`` store multi-controller and verifies it (rank 0
    alone writes the sidecar, see ``_save_ivf_sidecar``).
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        import jax

        self._spmd_rank = jax.process_index()
        self._spmd_world = jax.process_count()
        # rank 0 may serve from many threads (ThreadingWSGIServer + the
        # micro-batcher); SPMD needs broadcast order == device-entry
        # order, so each op holds this lock across broadcast + execution
        self._spmd_lock = threading.RLock()
        # once shutdown has been broadcast the followers have left
        # follow() — a late op (e.g. a micro-batcher thread draining its
        # queue during app teardown) must NOT fan out, or rank 0 blocks
        # forever in a collective nobody else enters.  It must not
        # "execute locally" either: on a multi-controller mesh the local
        # dispatch enters the SAME cross-process device collectives the
        # skipped broadcast guarded (shard_map/all_gather over global
        # devices), reproducing the hang — so post-shutdown device ops
        # fail fast with RuntimeError instead (review round 4)
        self._spmd_shutdown = False
        self.spmd_ops_replayed = 0

    # -- primary-side fan-out ------------------------------------------
    def _check_live(self) -> None:
        """Reject device ops after shutdown on a multi-controller mesh.
        The computation itself spans every process's devices, so with
        the followers gone it would block in a collective forever —
        a RuntimeError (→ HTTP 500 on a teardown-race request) is the
        correct failure mode.  Single-process meshes keep working."""
        if self._spmd_shutdown and self._spmd_world > 1:
            raise RuntimeError(
                "SPMD serving is shut down: followers have exited, a "
                "mesh-wide device op can no longer execute"
            )

    def _announce(self, header: List[int]) -> None:
        if self._spmd_world == 1 or self._spmd_rank != 0 or self._spmd_shutdown:
            return
        import os, sys
        if os.environ.get("SPMD_DEBUG"):
            print(f"[spmd-debug] announce {header}", file=sys.stderr, flush=True)
        padded = (header + [0] * 8)[:8]
        _broadcast(np.asarray(padded, np.int64))

    def _send(self, arr: np.ndarray) -> None:
        if self._spmd_world == 1 or self._spmd_rank != 0 or self._spmd_shutdown:
            return
        _broadcast(np.ascontiguousarray(arr))

    def _route_search(
        self, queries: np.ndarray, k: int, mask: Optional[np.ndarray]
    ):
        with self._spmd_lock:
            self._check_live()
            if self._spmd_rank == 0 and self._spmd_world > 1:
                q = np.atleast_2d(np.asarray(queries, np.float32))
                mask_len = 0 if mask is None else int(np.asarray(mask).shape[0])
                self._announce(
                    [_OP_SEARCH, q.shape[0], q.shape[1], int(k), mask_len]
                )
                self._send(q)
                if mask is not None:
                    self._send(np.asarray(mask, np.uint8))
            return super()._route_search(queries, k, mask)

    def raw_grouped_search_batch(
        self,
        query_embeddings: np.ndarray,
        top_k: int,
        mask_table: np.ndarray,
        mask_ids: np.ndarray,
    ):
        with self._spmd_lock:
            self._check_live()
            if self._spmd_rank == 0 and self._spmd_world > 1:
                q = np.atleast_2d(np.asarray(query_embeddings, np.float32))
                table = np.asarray(mask_table, np.uint8)
                self._announce(
                    [
                        _OP_GROUPED,
                        q.shape[0],
                        q.shape[1],
                        int(top_k),
                        table.shape[0],
                        table.shape[1],
                    ]
                )
                self._send(q)
                self._send(table)
                self._send(np.asarray(mask_ids, np.int64))
            return super().raw_grouped_search_batch(
                query_embeddings, top_k, mask_table, mask_ids
            )

    def add_batch(
        self, embeddings: np.ndarray, metadatas: List[Dict[str, Any]]
    ) -> None:
        with self._spmd_lock:
            self._check_live()
            if self._spmd_rank == 0 and self._spmd_world > 1:
                emb = np.atleast_2d(np.asarray(embeddings, np.float32))
                blob = json.dumps(metadatas, ensure_ascii=False).encode("utf-8")
                self._announce(
                    [_OP_ADD, emb.shape[0], emb.shape[1], len(blob)]
                )
                self._send(emb)
                self._send(np.frombuffer(blob, np.uint8))
            super().add_batch(embeddings, metadatas)

    def add_item(self, embedding: Any, metadata: Dict[str, Any]) -> None:
        # the base class appends straight to the store, bypassing
        # add_batch — route through add_batch so the append is broadcast
        self.add_batch(
            np.asarray(embedding, np.float32)[None, :], [metadata]
        )

    def load(self) -> bool:
        with self._spmd_lock:
            self._check_live()
            if self._spmd_rank == 0 and self._spmd_world > 1:
                self._announce([_OP_RELOAD])
            return super().load()

    def clear(self) -> None:
        with self._spmd_lock:
            self._check_live()
            if self._spmd_rank == 0 and self._spmd_world > 1:
                self._announce([_OP_CLEAR])
            super().clear()

    def shutdown_followers(self) -> None:
        """Release every follower from :meth:`follow` (rank 0 only).
        Idempotent; afterwards device ops on a multi-controller mesh
        raise RuntimeError instead of fanning out or executing locally
        (the followers are gone — either a post-shutdown broadcast or
        the mesh-wide computation itself would block rank 0 in a
        collective forever)."""
        with self._spmd_lock:
            if self._spmd_shutdown:
                return
            self._announce([_OP_SHUTDOWN])
            self._spmd_shutdown = True

    # -- follower side --------------------------------------------------
    def follow(self) -> int:
        """Replay rank 0's device-entering ops until shutdown.  Returns
        the number of ops replayed."""
        if self._spmd_rank == 0:
            raise RuntimeError("follow() is for non-zero ranks")
        while True:
            header = _broadcast(np.zeros(8, np.int64))
            op = int(header[0])
            if op == _OP_SHUTDOWN:
                return self.spmd_ops_replayed
            if op == _OP_SEARCH:
                q_n, dim, k, mask_len = (int(x) for x in header[1:5])
                queries = _broadcast(np.zeros((q_n, dim), np.float32))
                mask = None
                if mask_len:
                    mask = _broadcast(np.zeros(mask_len, np.uint8)).astype(bool)
                super()._route_search(np.asarray(queries), k, mask)
            elif op == _OP_GROUPED:
                q_n, dim, k, n_masks, n_rows = (int(x) for x in header[1:6])
                queries = _broadcast(np.zeros((q_n, dim), np.float32))
                table = _broadcast(np.zeros((n_masks, n_rows), np.uint8))
                ids = _broadcast(np.zeros(q_n, np.int64))
                super().raw_grouped_search_batch(
                    np.asarray(queries),
                    k,
                    np.asarray(table, bool),
                    np.asarray(ids),
                )
            elif op == _OP_ADD:
                b_n, dim, blob_len = (int(x) for x in header[1:4])
                emb = _broadcast(np.zeros((b_n, dim), np.float32))
                blob = _broadcast(np.zeros(blob_len, np.uint8))
                metadatas = json.loads(bytes(bytearray(blob.tolist())))
                super().add_batch(np.asarray(emb), metadatas)
            elif op == _OP_RELOAD:
                super().load()
            elif op == _OP_CLEAR:
                super().clear()
            else:  # pragma: no cover - protocol violation
                raise RuntimeError(f"unknown SPMD op {op}")
            self.spmd_ops_replayed += 1
