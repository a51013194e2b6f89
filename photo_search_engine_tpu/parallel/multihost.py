"""Multi-host (DCN) dry-run: the distributed-coordination story, proven.

SURVEY.md §5: "multi-host corpora coordinate over DCN via standard JAX
multi-controller runtime."  The single-host path (parallel/sharded.py)
shards the corpus over a ``jax.sharding.Mesh`` and merges per-shard
partial top-k with ``all_gather`` — by construction that code is
topology-agnostic: the SAME ``shard_map`` program runs unchanged when the
mesh spans processes, with XLA routing the collectives over ICI within a
host and DCN across hosts.

This module is the executable proof: ``worker_main`` joins a
``jax.distributed`` multi-controller job (CPU backend, Gloo collectives —
the standard way to exercise multi-process JAX without a pod), builds a
mesh over the GLOBAL device set, and runs ``sharded_exact_search`` with
each process contributing its own local corpus shards via
``make_array_from_process_local_data``.  The merged result is replicated
to every process and checked against a NumPy oracle of the full corpus.

``launch_dryrun`` spawns N such workers on localhost (distinct processes
= distinct JAX controllers, coordination over TCP exactly as over DCN)
and reports success only when every worker verified the oracle.

Run directly:   python -m photo_search_engine_tpu.parallel.multihost
As a worker:    python -m photo_search_engine_tpu.parallel.multihost \
                    --coordinator localhost:PORT --num-processes 2 \
                    --process-id 0 --local-devices 4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from typing import List, Optional

_OK_MARKER = "MULTIHOST_DRYRUN_OK"


def worker_main(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: int = 4,
    rows: int = 1024,
    dim: int = 64,
    k: int = 10,
) -> None:
    """One multi-controller worker; prints the OK marker after verifying
    the sharded search against a full-corpus NumPy oracle."""
    import jax

    # this must run before the backend initializes; the env-var alone is
    # not enough on hosts whose sitecustomize prepends other platforms
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from photo_search_engine_tpu.parallel.sharded import sharded_exact_search

    devices = jax.devices()
    n_devices = len(devices)
    assert n_devices == num_processes * local_devices, (
        f"expected {num_processes * local_devices} global devices, got {n_devices}"
    )
    mesh = Mesh(np.array(devices), ("data",))

    # identical corpus derivation on every controller (same seed), but each
    # process UPLOADS only its own rows — the multi-host data path
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(rows, dim)).astype(np.float32)
    queries = rng.normal(size=(8, dim)).astype(np.float32)
    sharding = NamedSharding(mesh, P("data", None))
    local_rows = rows // num_processes
    local_block = corpus[process_id * local_rows : (process_id + 1) * local_rows]
    corpus_global = jax.make_array_from_process_local_data(
        sharding, local_block, global_shape=corpus.shape
    )

    vals, idx = sharded_exact_search(
        corpus_global, queries, k, mesh, metric="ip"
    )
    got_idx = np.asarray(idx)  # replicated output → addressable everywhere
    got_vals = np.asarray(vals)

    scores = queries @ corpus.T
    oracle_idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    oracle_vals = np.take_along_axis(scores, oracle_idx, axis=1)
    np.testing.assert_allclose(got_vals, oracle_vals, rtol=1e-5, atol=1e-5)
    # indices may differ only inside exact-tie windows; values above pin it
    agree = (got_idx == oracle_idx).mean()
    assert agree >= 0.99, f"index agreement {agree}"
    print(f"{_OK_MARKER} process={process_id} devices={n_devices}", flush=True)


_SERVING_OK_MARKER = "MULTIHOST_SERVING_OK"


def worker_serving_main(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: int = 4,
    rows: int = 1024,
    dim: int = 32,
    k: int = 10,
) -> None:
    """The serving slice over DCN: the ACTUAL ``VectorIndex.search_batch``
    path (store → mesh kernels → metadata resolution) on a multi-controller
    mesh, not just the bare kernel.

    SPMD serving model: every controller runs the same VectorIndex logic
    with the same metadata (replicated host state); device data is
    process-local — ``parallel.sharded._stage`` uploads each controller's
    addressable slice via ``make_array_from_process_local_data``, so no
    process ever touches a remote device.  Incremental appends exercise the
    donated per-shard tail-update path under the same rule."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import tempfile

    import numpy as np

    from photo_search_engine_tpu.core.vector_index import VectorIndex

    n_devices = len(jax.devices())
    assert n_devices == num_processes * local_devices
    assert len(jax.local_devices()) == local_devices

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(rows, dim)).astype(np.float32)
    queries = rng.normal(size=(8, dim)).astype(np.float32)
    tmp = tempfile.mkdtemp(prefix=f"mh_serving_{process_id}_")
    vi = VectorIndex(
        dimension=dim,
        index_path=f"{tmp}/mh.index",
        metadata_path=f"{tmp}/mh-meta.json",
        metric="cosine",
        mesh_devices=n_devices,
    )
    # two appends: the second exercises the incremental per-shard
    # tail-update sync (not just the first full upload)
    split = rows // 2
    vi.add_batch(
        corpus[:split], [{"photo_path": f"/p/{i}.jpg"} for i in range(split)]
    )
    vi.search(corpus[0].tolist(), 1)  # force the first sync
    vi.add_batch(
        corpus[split:],
        [{"photo_path": f"/p/{i}.jpg"} for i in range(split, rows)],
    )

    # every device buffer this controller sees lives on its own devices
    device_buf = vi._store._sharded._device
    assert all(
        s.device.process_index == jax.process_index()
        for s in device_buf.addressable_shards
    ), "store buffer has shards this process should not address"

    unit = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    qunit = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    scores = qunit @ unit.T
    oracle = np.argsort(-scores, axis=1, kind="stable")[:, :k]

    batches = vi.search_batch(queries, k)
    for qi, hits in enumerate(batches):
        got = [h["metadata"]["photo_path"] for h in hits]
        want = [f"/p/{j}.jpg" for j in oracle[qi]]
        assert got == want, f"query {qi}: {got} != {want}"

    # masked search (the ES-filter analogue) over the same DCN mesh
    mask = np.zeros(rows, bool)
    mask[100:300] = True
    masked = vi.search_masked(queries[0].tolist(), k, mask)
    masked_scores = scores[0].copy()
    masked_scores[~mask] = -np.inf
    want_masked = [
        f"/p/{j}.jpg" for j in np.argsort(-masked_scores, kind="stable")[:k]
    ]
    got = [h["metadata"]["photo_path"] for h in masked]
    assert got == want_masked, f"masked: {got} != {want_masked}"

    # ---- IVF on the multi-controller mesh -----------------------------
    # The lazy _ensure_ivf build IS rank-reproducible: host mirrors are
    # replicated (every controller appends the same rows; _stage slices
    # the addressable part only at device upload), all host randomness is
    # seeded, and every device step (data-parallel k-means, probe kernel,
    # autotune searches) is the same SPMD computation entered in the same
    # order on every rank.  Autotune on iid noise escalates to full probe
    # (recall target unreachable by pruning), so results must match the
    # exact oracle bit-for-bit.
    vi_ivf = VectorIndex(
        dimension=dim,
        index_path=f"{tmp}/mh_ivf.index",
        metadata_path=f"{tmp}/mh_ivf-meta.json",
        metric="cosine",
        mesh_devices=n_devices,
        index_type="ivf",
        ivf_nlist=16,
        ivf_nprobe=0,  # autotune: exercises the doubling loop on-mesh
    )
    vi_ivf.add_batch(
        corpus, [{"photo_path": f"/p/{i}.jpg"} for i in range(rows)]
    )
    batches = vi_ivf.search_batch(queries, k)
    assert vi_ivf.last_route["impl"] == "ivf", vi_ivf.last_route
    for qi, hits in enumerate(batches):
        got = [h["metadata"]["photo_path"] for h in hits]
        want = [f"/p/{j}.jpg" for j in oracle[qi]]
        assert got == want, f"ivf query {qi}: {got} != {want}"

    # masked IVF keeps cluster pruning on the multi-controller mesh
    masked = vi_ivf.search_masked(queries[0].tolist(), k, mask)
    assert vi_ivf.last_route["impl"] == "ivf_masked", vi_ivf.last_route
    got = [h["metadata"]["photo_path"] for h in masked]
    assert got == want_masked, f"ivf masked: {got} != {want_masked}"

    # incremental append AFTER the IVF build: rows scatter into existing
    # per-shard cluster slots without retraining (rank-identical on every
    # controller), and a perfect-match query finds the new row
    probe = rng.normal(size=(1, dim)).astype(np.float32)
    vi_ivf.add_batch(probe, [{"photo_path": "/p/new.jpg"}])
    hits = vi_ivf.search(probe[0].tolist(), 1)
    assert hits and hits[0]["metadata"]["photo_path"] == "/p/new.jpg", hits

    # ---- int8 (quantized) store on the multi-controller mesh ----------
    vi_i8 = VectorIndex(
        dimension=dim,
        index_path=f"{tmp}/mh_i8.index",
        metadata_path=f"{tmp}/mh_i8-meta.json",
        metric="cosine",
        mesh_devices=n_devices,
        quantized=True,
    )
    vi_i8.add_batch(
        corpus, [{"photo_path": f"/p/{i}.jpg"} for i in range(rows)]
    )
    batches = vi_i8.search_batch(queries, k)
    assert vi_i8.last_route["impl"] == "int8", vi_i8.last_route
    overlap = 0.0
    for qi, hits in enumerate(batches):
        got = {h["metadata"]["photo_path"] for h in hits}
        want = {f"/p/{j}.jpg" for j in oracle[qi]}
        overlap += len(got & want) / k
    overlap /= len(batches)
    assert overlap >= 0.9, f"int8 multi-controller recall {overlap}"

    print(
        f"{_SERVING_OK_MARKER} process={process_id} devices={n_devices}",
        flush=True,
    )


_HTTP_OK_MARKER = "MULTIHOST_HTTP_OK"


def worker_http_main(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: int = 4,
    rows: int = 512,
    dim: int = 32,
    k: int = 5,
) -> None:
    """Full multi-host HTTP serving: rank 0 runs the UNCHANGED single-host
    stack (Searcher → micro-batcher → WSGI app → real HTTP listener) over
    an ``SPMDVectorIndex``; every other controller replays the fanned-out
    device ops in :meth:`SPMDVectorIndex.follow`.

    This closes the "request fan-in" item of DESIGN.md §3's multi-host
    serving model: indexing (add_batch broadcast), exact and masked
    searches arriving over real HTTP, and the grouped per-query-filter
    path all execute in SPMD lockstep across 2 controllers × N devices.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import json
    import socket
    import tempfile
    import threading
    import urllib.request

    import numpy as np

    from photo_search_engine_tpu.parallel.spmd_serving import SPMDVectorIndex

    n_devices = len(jax.devices())
    assert n_devices == num_processes * local_devices

    tmp = tempfile.mkdtemp(prefix=f"mh_http_{process_id}_")
    vi = SPMDVectorIndex(
        dimension=dim,
        index_path=f"{tmp}/mh.index",
        metadata_path=f"{tmp}/mh-meta.json",
        metric="cosine",
        mesh_devices=n_devices,
    )

    if process_id != 0:
        replayed = vi.follow()
        assert vi.get_total_items() == rows, (
            f"follower store has {vi.get_total_items()} rows, want {rows}"
        )
        # add (≥2) + HTTP searches (≥3) + masked + grouped must all have
        # fanned in
        assert replayed >= 7, f"only {replayed} ops replayed"
        print(
            f"{_HTTP_OK_MARKER} process={process_id} replayed={replayed}",
            flush=True,
        )
        return

    # ---- rank 0: the unchanged single-host serving stack --------------
    from photo_search_engine_tpu.api.app import create_app
    from photo_search_engine_tpu.core.batcher import attach_microbatcher
    from photo_search_engine_tpu.core.searcher import Searcher
    from photo_search_engine_tpu.models.hash_embedder import (
        HashingEmbeddingService,
    )
    from photo_search_engine_tpu.services.time_parser import TimeParser

    embedding = HashingEmbeddingService(dimension=dim)
    texts = [f"照片 场景 {i}" for i in range(rows)]
    vecs = np.stack(
        [np.asarray(embedding.generate_embedding(t), np.float32) for t in texts]
    )
    metas = [{"photo_path": f"/p/{i}.jpg", "description": texts[i]} for i in range(rows)]
    # two appends → the second replays the incremental tail-update path
    vi.add_batch(vecs[: rows // 2], metas[: rows // 2])
    vi.add_batch(vecs[rows // 2 :], metas[rows // 2 :])

    searcher = Searcher(
        embedding=embedding,
        time_parser=TimeParser(backend="local"),
        vector_index=vi,
        keyword_index=None,
        data_dir=tmp,
        top_k=k,
        query_expansion_enabled=False,
        query_multi_round_enabled=False,
        query_reflection_enabled=False,
        query_cache_enabled=False,
        embedding_cache_enabled=False,
    )
    searcher.index_loaded = True
    attach_microbatcher(vi, max_batch=16, window_s=0.002)

    class _ReadyIndexer:
        def get_status(self):
            return {
                "status": "ready",
                "message": "spmd corpus",
                "total_count": rows,
                "indexed_count": rows,
                "failed_count": 0,
            }

    app = create_app(
        {
            "config": {"TOP_K": k, "DEFAULT_SEARCH_MODE": "fast"},
            "indexer": _ReadyIndexer(),
            "searcher": searcher,
            "text_rerank_service": None,
            "visual_rerank_service": None,
        }
    )
    from socketserver import ThreadingMixIn
    from wsgiref.simple_server import WSGIRequestHandler, WSGIServer, make_server

    class QuietHandler(WSGIRequestHandler):
        def log_message(self, *args):
            pass

    class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
        daemon_threads = True
        request_queue_size = 128  # default backlog of 5 resets under load

    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        http_port = probe.getsockname()[1]
    server = make_server(
        "127.0.0.1", http_port, app, server_class=ThreadingWSGIServer,
        handler_class=QuietHandler,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()

    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    def _row(path: str) -> int:
        return int(path.rsplit("/", 1)[1].split(".")[0])

    # hash embeddings collide/near-tie at small dims, and float noise
    # decides tie order differently per kernel — assert achieved score
    # vs the oracle optimum (tie-tolerant), not exact argmax identity
    try:
        for qi in (3, 71, 200):
            body = json.dumps({"query": texts[qi], "top_k": k}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{http_port}/search_photos",
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                payload = json.loads(resp.read())
            got = [r["photo_path"] for r in payload["results"]]
            qv = np.asarray(
                embedding.generate_embedding(texts[qi]), np.float32
            )
            qv /= np.linalg.norm(qv)
            sims = unit @ qv
            assert got, f"q{qi}: empty results"
            achieved = float(sims[_row(got[0])])
            best = float(sims.max())
            assert achieved >= best - 1e-5, (
                f"q{qi}: top hit {got[0]} scores {achieved:.6f} < oracle "
                f"{best:.6f}"
            )

        # masked (the time-filter analogue) + grouped fan-in over DCN
        mask = np.zeros(rows, bool)
        mask[64:256] = True
        hits = vi.search_masked(vecs[70].tolist(), k, mask)
        scores = unit @ unit[70]
        scores[~mask] = -np.inf
        assert hits, "masked search returned nothing"
        top_path = hits[0]["metadata"]["photo_path"]
        assert mask[_row(top_path)], f"masked hit {top_path} outside filter"
        assert float(scores[_row(top_path)]) >= float(scores.max()) - 1e-5

        table = np.stack([mask, ~mask]).astype(bool)
        gd, gidx = vi.raw_grouped_search_batch(
            vecs[70:72], k, table, np.asarray([0, 1], np.int64)
        )
        g0 = int(gidx[0, 0])
        assert mask[g0] and float(scores[g0]) >= float(scores.max()) - 1e-5
    finally:
        server.shutdown()
        vi.shutdown_followers()
    print(f"{_HTTP_OK_MARKER} process=0 devices={n_devices}", flush=True)


def launch_dryrun(
    num_processes: int = 2,
    local_devices: int = 4,
    timeout: float = 300.0,
    port: Optional[int] = None,
    serving: bool = False,
    http: bool = False,
) -> bool:
    """Spawn ``num_processes`` worker processes on localhost and verify
    every one of them reached the oracle check.  Returns True on success.
    ``serving=True`` runs the VectorIndex serving slice
    (``worker_serving_main``) instead of the bare-kernel worker."""
    import socket

    rows = 1024  # worker_main default; keep the guard in sync
    if rows % (num_processes * local_devices):
        raise ValueError(
            f"corpus rows ({rows}) must divide evenly by num_processes x "
            f"local_devices ({num_processes} x {local_devices}); tail rows "
            "would be dropped and make_array_from_process_local_data would "
            "fail with an opaque shard-shape error"
        )

    if port is None:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
    env = dict(os.environ)
    # drop any inherited device-count flag (e.g. the test conftest's =8);
    # with duplicates, the LAST occurrence wins inside XLA
    inherited = [
        flag
        for flag in env.get("XLA_FLAGS", "").split()
        if not flag.startswith("--xla_force_host_platform_device_count")
    ]
    env["XLA_FLAGS"] = " ".join(
        inherited + [f"--xla_force_host_platform_device_count={local_devices}"]
    )
    env.pop("JAX_PLATFORMS", None)  # the worker pins cpu via jax.config
    if http:
        marker = _HTTP_OK_MARKER
        mode_flags = ["--http"]
    elif serving:
        marker = _SERVING_OK_MARKER
        mode_flags = ["--serving"]
    else:
        marker = _OK_MARKER
        mode_flags = []
    procs: List[subprocess.Popen] = []
    for pid in range(num_processes):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "photo_search_engine_tpu.parallel.multihost",
                    "--coordinator",
                    f"localhost:{port}",
                    "--num-processes",
                    str(num_processes),
                    "--process-id",
                    str(pid),
                    "--local-devices",
                    str(local_devices),
                ]
                + mode_flags,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    ok = True
    for pid, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            ok = False
        if proc.returncode != 0 or marker not in (out or ""):
            ok = False
            print(f"[multihost] worker {pid} failed (rc={proc.returncode}):")
            print(out or "<no output>")
    return ok


def launch_app_dryrun(
    num_processes: int = 2,
    local_devices: int = 4,
    timeout: float = 420.0,
    n_photos: int = 4,
) -> bool:
    """End-to-end multi-host DEPLOYMENT dry-run: spawn ``num_processes``
    instances of the real server entrypoint (``python -m
    photo_search_engine_tpu.api.app``) joined into one ``jax.distributed``
    job via the DIST_* config triplet, then drive rank 0 over real HTTP —
    /init_index on a PIL-generated photo dir, /index_status polling,
    /search_photos — and shut down with SIGINT so the follower's replay
    count is printed.  This is the production multi-host story, not a
    test harness: no app code is special-cased for the dry-run."""
    import json
    import shutil
    import signal
    import socket
    import tempfile
    import time
    import urllib.request

    from PIL import Image

    root = tempfile.mkdtemp(prefix="mh_app_")
    photo_dir = os.path.join(root, "photos")
    data_dir = os.path.join(root, "data")
    os.makedirs(photo_dir)
    os.makedirs(data_dir)
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200), (220, 220, 40)]
    for i in range(n_photos):
        img = Image.new("RGB", (48, 36), colors[i % len(colors)])
        exif = Image.Exif()
        exif[306] = f"2024:0{1 + i % 8}:15 12:00:00"
        img.save(os.path.join(photo_dir, f"photo_{i}.jpg"), exif=exif)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord_port = s.getsockname()[1]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        http_port = s.getsockname()[1]

    base_env = dict(os.environ)
    inherited = [
        flag
        for flag in base_env.get("XLA_FLAGS", "").split()
        if not flag.startswith("--xla_force_host_platform_device_count")
    ]
    base_env["XLA_FLAGS"] = " ".join(
        inherited + [f"--xla_force_host_platform_device_count={local_devices}"]
    )
    base_env.pop("JAX_PLATFORMS", None)
    base_env.update(
        PSE_PLATFORM="cpu",  # jax.config-level pin (env alone is ignored here)
        DIST_COORDINATOR=f"127.0.0.1:{coord_port}",
        DIST_NUM_PROCESSES=str(num_processes),
        PHOTO_DIR=photo_dir,
        DATA_DIR=data_dir,
        SERVER_HOST="127.0.0.1",
        SERVER_PORT=str(http_port),
        EMBEDDING_DIMENSION="64",
        MESH_DEVICES="-1",
        INDEX_BACKGROUND_MODE="thread",
        # the production multi-controller config runs IVF: the lazy build
        # must be rank-reproducible through the SPMD fan-in (rank 0
        # triggers it inside a broadcast _route_search; followers build
        # identically during replay)
        VECTOR_INDEX_TYPE="ivf",
        IVF_NLIST="8",
        IVF_NPROBE="0",
    )

    procs: List[subprocess.Popen] = []
    logs: List[str] = []
    for pid in range(num_processes):
        env = dict(base_env, DIST_PROCESS_ID=str(pid))
        log_path = os.path.join(root, f"rank{pid}.log")
        logs.append(log_path)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "photo_search_engine_tpu.api.app"],
                env=env,
                stdout=open(log_path, "w"),
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    def _read(pid: int) -> str:
        try:
            with open(logs[pid]) as f:
                return f.read()
        except OSError:
            return ""

    def _fail(why: str) -> bool:
        print(f"[multihost-app] FAIL: {why}")
        for pid in range(num_processes):
            print(f"--- rank {pid} log ---")
            print(_read(pid) or "<empty>")
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
        return False

    deadline = time.time() + timeout
    try:
        # 1. wait for rank 0's listener
        while "serving on http://" not in _read(0):
            if time.time() > deadline or procs[0].poll() is not None:
                return _fail("rank 0 never started serving")
            time.sleep(0.5)
        base = f"http://127.0.0.1:{http_port}"

        def _post(path: str, payload: dict) -> dict:
            req = urllib.request.Request(
                f"{base}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json.loads(resp.read())

        # 2. build the index (thread mode; add_batch broadcasts to ranks)
        _post("/init_index", {"mode": "full"})
        while True:
            with urllib.request.urlopen(f"{base}/index_status", timeout=30) as r:
                status = json.loads(r.read())
            state = str(status.get("status") or "")
            if state in {"ready", "success", "completed"}:
                break
            if state in {"failed", "error"}:
                return _fail(f"indexing failed: {status}")
            if time.time() > deadline:
                return _fail(f"indexing timed out in state {state!r}: {status}")
            time.sleep(1.0)

        # 3. search over HTTP (triggers load() broadcast + batched scan)
        payload = _post("/search_photos", {"query": "红色 照片", "top_k": 3})
        results = payload.get("results") or []
        if not results:
            return _fail(f"empty search results: {payload}")
        route = (payload.get("search_debug") or {}).get("index_route") or {}
        if route.get("impl") != "ivf":
            return _fail(f"expected the ivf route, served {route}")
        # a time-filtered query exercises the masked path end to end
        _post("/search_photos", {"query": "一月 的 照片", "top_k": 3})
    except Exception as exc:  # noqa: BLE001
        return _fail(f"driver exception: {exc!r}")
    finally:
        if procs[0].poll() is None:
            procs[0].send_signal(signal.SIGINT)

    ok = True
    for pid, proc in enumerate(procs):
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            ok = False
    for pid in range(1, num_processes):
        out = _read(pid)
        if "replayed" not in out or procs[pid].returncode != 0:
            print(f"[multihost-app] follower {pid} bad exit "
                  f"(rc={procs[pid].returncode}):")
            print(out or "<empty>")
            ok = False
    if ok and procs[0].returncode != 0:
        print(f"[multihost-app] rank 0 rc={procs[0].returncode}")
        print(_read(0))
        ok = False
    if ok:
        shutil.rmtree(root, ignore_errors=True)
    return ok


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator")
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--process-id", type=int)
    parser.add_argument("--local-devices", type=int, default=4)
    parser.add_argument(
        "--serving",
        action="store_true",
        help="run the VectorIndex serving slice instead of the bare kernel",
    )
    parser.add_argument(
        "--http",
        action="store_true",
        help="run the full HTTP serving slice (rank-0 listener + SPMD fan-in)",
    )
    args = parser.parse_args(argv)
    if args.coordinator is not None and args.process_id is not None:
        if args.http:
            worker = worker_http_main
        elif args.serving:
            worker = worker_serving_main
        else:
            worker = worker_main
        worker(
            args.coordinator,
            args.num_processes,
            args.process_id,
            args.local_devices,
        )
        return 0
    ok = launch_dryrun(
        args.num_processes,
        args.local_devices,
        serving=args.serving,
        http=args.http,
    )
    print(f"multihost dryrun: {'OK' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
