"""photo_search_engine_tpu — a TPU-native photo index-and-search framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
shizhenneko/Photo_Search_Engine: structured image analysis, incremental
photo indexing, text-to-image / image-to-image / upload-to-search retrieval,
hybrid vector+keyword fusion with graceful degradation, EXIF-derived time
semantics filtering, multi-round LLM query planning, and two-stage rerank.

The retrieval core is an HBM-resident embedding matrix queried by a Pallas
tiled dot-product kernel with fused on-chip top-k and masked filtering,
sharded across TPU chips (data-parallel over corpus rows) with all-gather
merge of per-shard partial top-k over ICI.

Layer map (mirrors reference layering, SURVEY.md §1):
  config            — env-driven config (reference: config.py)
  ops/              — Pallas kernels + jnp oracles (replaces FAISS C++)
  parallel/         — jax.sharding mesh + shard_map sharded search
  core/             — embedding store, vector index, keyword index,
                      indexer, searcher (reference: utils/vector_store.py,
                      utils/keyword_store.py, core/indexer.py,
                      core/searcher.py)
  services/         — LLM-backed + deterministic-local services
                      (reference: utils/*_service.py, utils/query_formatter.py)
  models/           — on-device models (hashing text embedder, IVF)
  utils/            — host-side image/EXIF/path helpers
  api/              — HTTP surface (reference: api/routes.py, main.py)
"""

__version__ = "0.1.0"
