"""Composition root + server entry point.

Behavior-parity target: reference main.py —
* ``initialize_services`` (42-247): construct every service from config
  with constructor injection; optional services (keyword store, query
  formatter, reranks) fail soft with a warning → graceful degradation is
  the design rule
* ``create_app`` (250-277): register routes + JSON 404/500 handlers
* required-config validation (280-288) — here only PHOTO_DIR is truly
  required because every LLM-backed service has a deterministic local
  backend
* port-bind probing with automatic fallback ports (291-330, 346-362)
* ``--index-worker`` CLI mode (365-381).

Run:  python -m photo_search_engine_tpu.api.app
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
from typing import Any, Dict, Optional, Tuple

from photo_search_engine_tpu.api.routes import register_routes
from photo_search_engine_tpu.api.wsgi import App
from photo_search_engine_tpu.config import get_config
from photo_search_engine_tpu.core.indexer import Indexer
from photo_search_engine_tpu.core.keyword_index import KeywordIndex
from photo_search_engine_tpu.core.searcher import Searcher
from photo_search_engine_tpu.core.vector_index import VectorIndex
from photo_search_engine_tpu.models.hash_embedder import HashingEmbeddingService
from photo_search_engine_tpu.services.embedding import (
    DeviceTextRerankService,
    OpenAICompatibleEmbeddingService,
    TextRerankService,
)
from photo_search_engine_tpu.services.query_formatter import QueryFormatter
from photo_search_engine_tpu.services.rerank import (
    LocalVisualRerankService,
    VisualRerankService,
)
from photo_search_engine_tpu.services.time_parser import TimeParser
from photo_search_engine_tpu.services.vision import LocalVisionService, OpenAIVisionService


def _build_embedding_service(config: Dict[str, Any]):
    backend = str(config.get("EMBEDDING_BACKEND") or "auto").strip().lower()
    if backend == "auto":
        backend = "openai" if config.get("EMBEDDING_BASE_URL") else "local"
    if backend == "openai":
        return OpenAICompatibleEmbeddingService(
            api_key=config.get("EMBEDDING_API_KEY") or "",
            model_name=config["EMBEDDING_MODEL"],
            base_url=config["EMBEDDING_BASE_URL"],
            timeout=config["TIMEOUT"],
            max_retries=config["MAX_RETRIES"],
            dimension=config.get("EMBEDDING_DIMENSION"),
        )
    return HashingEmbeddingService(dimension=config.get("EMBEDDING_DIMENSION") or 1536)


def _build_vision_service(config: Dict[str, Any]):
    backend = str(config.get("VISION_BACKEND") or "auto").strip().lower()
    if backend == "auto":
        backend = (
            "openai"
            if config.get("VISION_BASE_URL") and config.get("VISION_API_KEY")
            else "local"
        )
    if backend == "openai":
        return OpenAIVisionService(
            api_key=config.get("VISION_API_KEY") or "",
            model_name=config["VISION_MODEL"],
            base_url=config["VISION_BASE_URL"],
            timeout=config["TIMEOUT"],
            max_retries=config["MAX_RETRIES"],
            image_max_size=config["IMAGE_MAX_SIZE"],
            image_quality=config["IMAGE_QUALITY"],
            image_format=config["IMAGE_FORMAT"],
            reasoning_effort=config["VISION_REASONING_EFFORT"],
            enhanced_reasoning_effort=config["VISION_ENHANCED_REASONING_EFFORT"],
            base_max_output_tokens=config["VISION_BASE_MAX_TOKENS"],
            enhanced_max_output_tokens=config["VISION_ENHANCED_MAX_TOKENS"],
            repair_max_output_tokens=config["VISION_REPAIR_MAX_TOKENS"],
            enhanced_analysis_enabled=config["ENHANCED_ANALYSIS_ENABLED"],
        )
    return LocalVisionService()


def _resolve_mesh_devices(requested: int) -> int:
    """MESH_DEVICES semantics: 0 = single-device store, N>=1 = mesh over the
    first N devices, -1 = all visible devices.  Clamped with a warning when
    fewer devices exist (graceful degradation, the reference design rule)."""
    requested = int(requested or 0)
    if requested == 0:
        return 0
    import jax

    available = len(jax.devices())
    if requested < 0:
        return available
    if requested > available:
        print(
            f"[WARN] MESH_DEVICES={requested} but only {available} device(s) "
            f"visible; using {available}"
        )
        return available
    return requested


def _vector_index_class_and_knobs(config: Dict[str, Any]):
    """Single-host → ``VectorIndex``.  On a multi-controller runtime
    (``jax.distributed`` initialized, process_count > 1) →
    ``SPMDVectorIndex`` (rank-0 broadcast fan-in, parallel/spmd_serving.py).
    The one knob SPMD lockstep adjusts (warned): the mesh must span the
    global devices.  ``index_type`` passes through unchanged — IVF is
    supported multi-controller (see comment below)."""
    import jax

    mesh_devices = _resolve_mesh_devices(config.get("MESH_DEVICES", 0))
    index_type = config["VECTOR_INDEX_TYPE"]
    if jax.process_count() <= 1:
        return VectorIndex, mesh_devices, index_type
    from photo_search_engine_tpu.parallel.spmd_serving import SPMDVectorIndex

    if mesh_devices == 0:
        mesh_devices = len(jax.devices())
        print(
            f"[WARN] multi-host run with MESH_DEVICES=0; using the global "
            f"mesh ({mesh_devices} devices)"
        )
    # index_type=ivf IS supported multi-controller: the lazy _ensure_ivf
    # build is rank-reproducible (host mirrors are replicated, all host
    # randomness is seeded, and every device step — data-parallel k-means,
    # probe kernels, autotune searches — is the same SPMD computation
    # entered in the same order on every rank; proven end-to-end in
    # test_multihost.py's serving slice).  Sidecar persistence is rank-0
    # only (vector_index._save_ivf_sidecar) so a shared DATA_DIR sees one
    # writer.
    return SPMDVectorIndex, mesh_devices, index_type


def initialize_services(config: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Construct + wire everything; optional pieces degrade to None or a
    local backend with a warning."""
    config = config or get_config()

    embedding_service = _build_embedding_service(config)
    vision_service = _build_vision_service(config)

    index_cls, mesh_devices, index_type = _vector_index_class_and_knobs(config)
    vector_index = index_cls(
        dimension=config.get("EMBEDDING_DIMENSION"),
        index_path=config["INDEX_PATH"],
        metadata_path=config["METADATA_PATH"],
        metric=config["VECTOR_METRIC"],
        index_type=index_type,
        store_dtype=config.get("STORE_DTYPE", "float32"),
        ivf_nlist=config.get("IVF_NLIST", 1024),
        ivf_nprobe=config.get("IVF_NPROBE", 64),
        ivf_target_recall=config.get("IVF_TARGET_RECALL", 0.98),
        store_block_rows=config.get("TOPK_BLOCK_N") or None,
        quantized=config.get("STORE_QUANTIZED", "auto"),
        mesh_devices=mesh_devices,
    )

    keyword_index = None
    keyword_backend = str(config.get("KEYWORD_BACKEND") or "builtin").lower()
    if keyword_backend == "builtin":
        try:
            keyword_index = KeywordIndex(config["KEYWORD_INDEX_PATH"])
            keyword_index.load()
        except Exception as exc:
            print(f"[WARN] keyword index disabled: {exc}")
            keyword_index = None
    elif keyword_backend == "elasticsearch":
        # optional real-ES adapter; init failure degrades the keyword
        # channel to None with a warning (reference main.py:114-127)
        try:
            from photo_search_engine_tpu.core.es_keyword_index import (
                ElasticsearchKeywordIndex,
            )

            keyword_index = ElasticsearchKeywordIndex(
                host=config.get("ELASTICSEARCH_HOST", "localhost"),
                port=config.get("ELASTICSEARCH_PORT", 9200),
                index_name=config.get("ELASTICSEARCH_INDEX", "photo_keywords"),
                username=config.get("ELASTICSEARCH_USERNAME"),
                password=config.get("ELASTICSEARCH_PASSWORD"),
            )
        except Exception as exc:
            print(f"[WARN] elasticsearch keyword backend unavailable: {exc}")
            keyword_index = None

    time_parser = TimeParser(
        api_key=config.get("TIME_PARSE_API_KEY") or "",
        model_name=config["TIME_PARSE_MODEL"],
        base_url=config.get("TIME_PARSE_BASE_URL") or "",
        reasoning_effort=config["TIME_PARSE_REASONING_EFFORT"],
        max_retries=config["MAX_RETRIES"],
        backend=config.get("TIME_PARSE_BACKEND", "auto"),
    )

    query_formatter = None
    if config.get("QUERY_FORMAT_ENABLED", True):
        try:
            query_formatter = QueryFormatter(
                api_key=config.get("QUERY_FORMAT_API_KEY") or "",
                model_name=config["QUERY_FORMAT_MODEL"],
                base_url=config.get("QUERY_FORMAT_BASE_URL") or "",
                reasoning_effort=config["QUERY_FORMAT_REASONING_EFFORT"],
                max_retries=config["MAX_RETRIES"],
                backend=config.get("QUERY_FORMAT_BACKEND", "auto"),
            )
        except Exception as exc:
            print(f"[WARN] query formatter disabled: {exc}")
            query_formatter = None

    text_rerank_service = None
    try:
        backend = str(config.get("TEXT_RERANK_BACKEND") or "auto").strip().lower()
        if backend in {"api", "chat"} or (
            backend == "auto" and config.get("TEXT_RERANK_BASE_URL")
        ):
            text_rerank_service = TextRerankService(
                api_key=config.get("TEXT_RERANK_API_KEY") or "",
                model_name=config["TEXT_RERANK_MODEL"],
                base_url=config["TEXT_RERANK_BASE_URL"],
                timeout=config["TEXT_RERANK_TIMEOUT"],
                max_retries=config["MAX_RETRIES"],
                backend=backend,
            )
        else:  # device: deterministic embedding cross-similarity
            text_rerank_service = DeviceTextRerankService(
                dimension=config.get("EMBEDDING_DIMENSION") or 1536
            )
    except Exception as exc:
        print(f"[WARN] text rerank disabled: {exc}")
        text_rerank_service = None

    visual_rerank_service = None
    if config.get("VISUAL_RERANK_ENABLED", True):
        try:
            if config.get("VISUAL_RERANK_BASE_URL") and config.get("VISUAL_RERANK_API_KEY"):
                visual_rerank_service = VisualRerankService(
                    api_key=config["VISUAL_RERANK_API_KEY"],
                    model_name=config["VISUAL_RERANK_MODEL"],
                    base_url=config["VISUAL_RERANK_BASE_URL"],
                    reasoning_effort=config["VISUAL_RERANK_REASONING_EFFORT"],
                    timeout=config["VISUAL_RERANK_TIMEOUT"],
                    max_retries=config["MAX_RETRIES"],
                    image_max_size=config["RERANK_IMAGE_MAX_SIZE"],
                    image_quality=config["RERANK_IMAGE_QUALITY"],
                    image_format=config["RERANK_IMAGE_FORMAT"],
                    max_images=config["RERANK_MAX_IMAGES"],
                )
            else:
                visual_rerank_service = LocalVisualRerankService(
                    dimension=config.get("EMBEDDING_DIMENSION") or 1536
                )
        except Exception as exc:
            print(f"[WARN] visual rerank disabled: {exc}")
            visual_rerank_service = None

    background_mode = config["INDEX_BACKGROUND_MODE"]
    if index_cls is not VectorIndex and background_mode == "process":
        # a spawned worker process would sit outside the jax.distributed
        # job, so its device ops could not be broadcast to the followers
        print("[WARN] multi-host run: INDEX_BACKGROUND_MODE=process → thread")
        background_mode = "thread"
    indexer = Indexer(
        photo_dir=config.get("PHOTO_DIR") or "",
        vector_index=vector_index,
        vision_service=vision_service,
        embedding_service=embedding_service,
        keyword_index=keyword_index,
        batch_size=config["BATCH_SIZE"],
        max_retries=config["MAX_RETRIES"],
        timeout=config["TIMEOUT"],
        data_dir=config["RUNTIME_DATA_DIR"],
        background_mode=background_mode,
        worker_python_executable=sys.executable,
        worker_entrypoint=["-m", "photo_search_engine_tpu.api.app"],
    )
    search_embedding = embedding_service
    if (
        config.get("SEARCH_MICROBATCH_ENABLED")
        and embedding_service is not None
        and hasattr(embedding_service, "generate_embedding_batch")
    ):
        # coalesce concurrent per-request query embeds into one device /
        # embedding-API call — the scan is micro-batched below, and under
        # load the per-request embed dispatch is the other round trip
        from photo_search_engine_tpu.core.batcher import BatchedEmbeddingService

        search_embedding = BatchedEmbeddingService(
            embedding_service,
            max_batch=config.get("SEARCH_MICROBATCH_MAX_BATCH", 128),
            window_s=config.get("SEARCH_MICROBATCH_WINDOW_MS", 3.0) / 1000.0,
            pipeline=config.get("SEARCH_MICROBATCH_PIPELINE", 2),
        )
    searcher = Searcher(
        embedding=search_embedding,
        time_parser=time_parser,
        vector_index=vector_index,
        keyword_index=keyword_index,
        query_formatter=query_formatter,
        data_dir=config["RUNTIME_DATA_DIR"],
        top_k=config["TOP_K"],
        vector_weight=config["VECTOR_WEIGHT"],
        keyword_weight=config["KEYWORD_WEIGHT"],
        query_expansion_enabled=config["QUERY_EXPANSION_ENABLED"],
        query_expansion_max_alternatives=config["QUERY_EXPANSION_MAX_ALTERNATIVES"],
        query_multi_round_enabled=config["QUERY_MULTI_ROUND_ENABLED"],
        query_reflection_enabled=config["QUERY_REFLECTION_ENABLED"],
        query_max_reflection_rounds=config["QUERY_MAX_REFLECTION_ROUNDS"],
        query_dynamic_threshold_floor=config["QUERY_DYNAMIC_THRESHOLD_FLOOR"],
        query_strict_floor_min=config["QUERY_STRICT_FLOOR_MIN"],
        query_broad_floor_min=config["QUERY_BROAD_FLOOR_MIN"],
        time_parse_strategy=config["TIME_PARSE_STRATEGY"],
        validate_file_exists=config["SEARCH_VALIDATE_FILE_EXISTS"],
        query_cache_enabled=config["QUERY_CACHE_ENABLED"],
        query_cache_size=config["QUERY_CACHE_SIZE"],
        embedding_cache_enabled=config["EMBEDDING_CACHE_ENABLED"],
        embedding_cache_size=config["EMBEDDING_CACHE_SIZE"],
        default_search_mode=config["DEFAULT_SEARCH_MODE"],
    )
    if config.get("SEARCH_MICROBATCH_ENABLED"):
        from photo_search_engine_tpu.core.batcher import attach_microbatcher

        attach_microbatcher(
            vector_index,
            max_batch=config.get("SEARCH_MICROBATCH_MAX_BATCH", 128),
            window_s=config.get("SEARCH_MICROBATCH_WINDOW_MS", 3.0) / 1000.0,
            pipeline=config.get("SEARCH_MICROBATCH_PIPELINE", 2),
        )

    return {
        "config": config,
        "embedding_service": embedding_service,
        "vision_service": vision_service,
        "vector_index": vector_index,
        "keyword_index": keyword_index,
        "time_parser": time_parser,
        "query_formatter": query_formatter,
        "text_rerank_service": text_rerank_service,
        "visual_rerank_service": visual_rerank_service,
        "indexer": indexer,
        "searcher": searcher,
    }


def create_app(services: Optional[Dict[str, Any]] = None) -> App:
    services = services or initialize_services()
    app = App()
    register_routes(
        app,
        indexer=services["indexer"],
        searcher=services["searcher"],
        config=services["config"],
        text_rerank_service=services.get("text_rerank_service"),
        visual_rerank_service=services.get("visual_rerank_service"),
    )
    return app


def _validate_required_config(config: Dict[str, Any]) -> None:
    if not config.get("PHOTO_DIR"):
        raise ValueError("PHOTO_DIR 未配置，请设置要索引的照片目录")


def _probe_port(host: str, port: int) -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as probe:
        probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        try:
            probe.bind((host, port))
            return True
        except OSError:
            return False


def pick_port(host: str, preferred: int, attempts: int = 10) -> Tuple[int, bool]:
    """Preferred port, else next free one (reference main.py:291-330)."""
    if _probe_port(host, preferred):
        return preferred, False
    for offset in range(1, attempts + 1):
        candidate = preferred + offset
        if _probe_port(host, candidate):
            return candidate, True
    raise OSError(f"no free port near {preferred}")


def run_index_worker(force_rebuild: bool) -> int:
    """Detached index-build worker (reference main.py:365-381)."""
    services = initialize_services()
    status = services["indexer"].build_index(
        force_rebuild=force_rebuild, lock_already_held=True
    )
    return 0 if status.get("status") in {"success", "ready"} else 1


def _apply_platform_override() -> None:
    """Honor PSE_PLATFORM=cpu|tpu before any device use.  Needed because
    some hosts' site customizations override JAX_PLATFORMS.

    PSE_PLATFORM=tpu is a *capability* request, not a platform string:
    on relay-attached hosts the chip is exposed through a plugin platform
    (e.g. "axon") whose devices still report platform "tpu", and forcing
    jax_platforms="tpu" there fails with "No jellyfish device found".  So
    candidates are probed in order until jax initializes with a TPU
    device visible."""
    import os

    wanted = (os.environ.get("PSE_PLATFORM") or "").strip().lower()
    if not wanted:
        return
    import jax

    candidates = [wanted] if wanted != "tpu" else ["tpu", "axon,cpu", None]
    prior = jax.config.jax_platforms
    last_exc = None
    for candidate in candidates:
        try:
            jax.config.update("jax_platforms", candidate)
            jax.devices()
            if wanted == "tpu" and jax.default_backend() != "tpu":
                last_exc = RuntimeError(
                    f"platforms={candidate!r} selected {jax.default_backend()}"
                )
                continue
            return
        except Exception as exc:  # try the next candidate
            last_exc = exc
    # restore the pre-override platform string: leaving the FAILED
    # candidate applied would crash every later device touch instead of
    # degrading gracefully as the WARN promises
    try:
        jax.config.update("jax_platforms", prior)
    except Exception:
        pass
    print(f"[WARN] PSE_PLATFORM={wanted} not applied: {last_exc}")


def _apply_compile_cache(config) -> None:
    """Honor COMPILE_CACHE_DIR: a persistent XLA compilation cache pins
    kernel schedules across server restarts (docs/ABLATION_INT8.md —
    freezes the int8 kernel's compile-session throughput variance to
    ±0.2%) and removes cold-start compile latency.  The native
    JAX_COMPILATION_CACHE_DIR env var wins if set."""
    path = (config.get("COMPILE_CACHE_DIR") or "").strip()
    if not path or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        print(f"[INFO] XLA compilation cache: {path}")
    except Exception as exc:  # fail-soft: serving works without the cache
        print(f"[WARN] COMPILE_CACHE_DIR not applied: {exc}")


def _apply_distributed(config: Dict[str, Any]) -> int:
    """Join a ``jax.distributed`` job when the DIST_* triplet is set;
    returns this process's rank (0 when single-host).  Must run before
    any device use.  Multi-host serving model: rank 0 owns the HTTP
    listener over an ``SPMDVectorIndex``; other ranks replay its device
    ops in lockstep (parallel/spmd_serving.py, DESIGN.md §3)."""
    coordinator = config.get("DIST_COORDINATOR") or ""
    if not coordinator:
        return 0
    num_processes = int(config.get("DIST_NUM_PROCESSES") or 0)
    process_id = int(config.get("DIST_PROCESS_ID", -1))
    if num_processes < 2 or process_id < 0:
        raise ValueError(
            "DIST_COORDINATOR is set but DIST_NUM_PROCESSES/DIST_PROCESS_ID "
            "are not a valid pair"
        )
    import jax

    # initialize() must precede ANY backend init, so a concrete
    # PSE_PLATFORM pin goes in config-only here; the probing override
    # (_apply_platform_override) runs after and is then a no-op probe
    wanted = (os.environ.get("PSE_PLATFORM") or "").strip().lower()
    if wanted and wanted != "tpu":
        jax.config.update("jax_platforms", wanted)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    print(
        f"[INFO] jax.distributed: rank {process_id}/{num_processes} via "
        f"{coordinator} ({len(jax.devices())} global devices)"
    )
    return process_id


def main(argv: Optional[list] = None) -> int:
    parser = argparse.ArgumentParser(description="photo_search_engine_tpu server")
    parser.add_argument("--index-worker", action="store_true")
    parser.add_argument("--force-rebuild", action="store_true")
    parser.add_argument("--host", default=None)
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args(argv)

    config = get_config()
    _validate_required_config(config)
    rank = _apply_distributed(config)  # before ANY backend init
    _apply_platform_override()
    _apply_compile_cache(config)

    if args.index_worker:
        return run_index_worker(force_rebuild=args.force_rebuild)

    services = initialize_services(config)

    if rank != 0:
        # follower: replay rank 0's device ops until it broadcasts shutdown
        print(f"[INFO] dist follower {rank} entering replay loop")
        replayed = services["vector_index"].follow()
        print(f"[INFO] dist follower {rank} replayed {replayed} ops")
        return 0

    app = create_app(services)
    host = args.host or config["SERVER_HOST"]
    port, fell_back = pick_port(host, args.port or config["SERVER_PORT"])
    if fell_back:
        print(f"[WARN] preferred port busy; falling back to {port}")

    from wsgiref.simple_server import WSGIServer, make_server
    from socketserver import ThreadingMixIn

    class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
        daemon_threads = True
        # socketserver's default listen backlog (5) resets connections
        # under concurrent load; searches queue in the micro-batcher, so
        # accept bursts instead of refusing them
        request_queue_size = 128

    server = make_server(host, port, app, server_class=ThreadingWSGIServer)
    print(f"[INFO] serving on http://{host}:{port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        index = services["vector_index"]
        if hasattr(index, "shutdown_followers"):
            index.shutdown_followers()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
