"""Device kernels for the retrieval core.

This package is the TPU-native replacement for the FAISS C++ library the
reference consumes (reference utils/vector_store.py:72-81 IndexFlatIP /
IndexFlatL2 via faiss-cpu).  The hot path — corpus scoring + top-k — runs
as a single fused Pallas kernel (tiled MXU dot-product with an on-chip
running top-k), so the full score vector is never materialized in HBM.
"""

from photo_search_engine_tpu.ops.grouped_mask import (
    grouped_mask_oracle,
    grouped_mask_search,
)
from photo_search_engine_tpu.ops.quantized import (
    grouped_int8_search,
    int8_search,
    quantize_rows,
)
from photo_search_engine_tpu.ops.topk import (
    exact_search,
    exact_search_oracle,
    l2_normalize,
)

__all__ = [
    "exact_search",
    "exact_search_oracle",
    "grouped_mask_oracle",
    "grouped_mask_search",
    "grouped_int8_search",
    "int8_search",
    "l2_normalize",
    "quantize_rows",
]
