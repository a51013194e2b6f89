"""Deterministic hashing text embedder (feature-hashing trick, device math).

Fills two roles:
* the **offline / local embedding backend** — the TPU-native counterpart of
  the reference's deterministic test embedder (reference tests/helpers.py
  FakeEmbeddingService:6-15) but with *meaningful* similarity: texts that
  share tokens land near each other, so recall metrics behave like a real
  embedding model's;
* the scoring model for the model-free device rerank path (BASELINE.md
  north star: batched embedding cross-similarity rerank).

Pipeline: host-side stable token hashing (strings can't live on the TPU) →
device-side scatter-add of signed tf weights into D buckets → device L2
normalization.  Hashes use blake2b, so embeddings are stable across
processes and machines (unlike Python's salted ``hash``).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from photo_search_engine_tpu.core.keyword_index import tokenize

_SUBLINEAR = True


def _round_up_pow2(value: int, *, base: int) -> int:
    """Next power of two ≥ max(base, value) — shape bucketing for the
    jitted scatter-add (see embed_batch)."""
    bucket = base
    while bucket < value:
        bucket *= 2
    return bucket


def _stable_hash(token: str, seed: int) -> int:
    digest = hashlib.blake2b(
        token.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little")
    ).digest()
    return int.from_bytes(digest, "little")


@jax.jit
def _accumulate_and_normalize(
    indices: jnp.ndarray, weights: jnp.ndarray, zeros: jnp.ndarray
) -> jnp.ndarray:
    """Scatter-add token weights into embedding buckets, then L2-normalize.
    indices: [B, T] int32 (padded with -1), weights: [B, T] float32."""
    valid = indices >= 0
    safe_idx = jnp.where(valid, indices, 0)
    weights = jnp.where(valid, weights, 0.0)
    vecs = jax.vmap(lambda z, i, w: z.at[i].add(w))(zeros, safe_idx, weights)
    norms = jnp.linalg.norm(vecs, axis=-1, keepdims=True)
    return vecs / jnp.maximum(norms, 1e-12)


class HashEmbedder:
    """Deterministic text → unit vector embedder."""

    def __init__(self, dimension: int = 1536, seed: int = 7) -> None:
        self.dimension = int(dimension)
        self.seed = int(seed)

    # ------------------------------------------------------------------
    def _features(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        """(bucket indices, signed tf weights) for one text."""
        tokens = tokenize(text)
        # token bigrams add word-order signal on top of the base stream
        tokens = tokens + [a + "␟" + b for a, b in zip(tokens, tokens[1:])]
        if not tokens:
            return np.zeros(0, np.int32), np.zeros(0, np.float32)
        counts: dict = {}
        for token in tokens:
            counts[token] = counts.get(token, 0) + 1
        idx = np.empty(len(counts), np.int32)
        weight = np.empty(len(counts), np.float32)
        for slot, (token, tf) in enumerate(counts.items()):
            h = _stable_hash(token, self.seed)
            idx[slot] = h % self.dimension
            sign = 1.0 if (h >> 62) & 1 else -1.0
            weight[slot] = sign * (1.0 + np.log(tf) if _SUBLINEAR and tf > 1 else float(tf))
        return idx, weight

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        feats = [self._features(t) for t in texts]
        max_len = max((len(i) for i, _ in feats), default=0)
        # bucket both dims so the jitted scatter-add compiles a bounded
        # shape set (organic serving traffic otherwise produces a fresh
        # [B, T] executable per batch-size × longest-text combination);
        # padded slots are index -1 / weight 0, padded rows slice off
        max_len = _round_up_pow2(max(max_len, 1), base=16)
        batch = len(feats)
        batch_p = _round_up_pow2(max(batch, 1), base=8)
        indices = np.full((batch_p, max_len), -1, np.int32)
        weights = np.zeros((batch_p, max_len), np.float32)
        for row, (idx, wgt) in enumerate(feats):
            indices[row, : len(idx)] = idx
            weights[row, : len(wgt)] = wgt
        zeros = jnp.zeros((batch_p, self.dimension), jnp.float32)
        idx_dev, wgt_dev = jnp.asarray(indices), jnp.asarray(weights)
        out = np.asarray(_accumulate_and_normalize(idx_dev, wgt_dev, zeros))
        # early-fetch guard (see VectorIndex._validated_fetch): rows are
        # unit-norm (or exactly zero for empty texts) by construction, so
        # a garbage fetch from a remote-attached runtime is detectable —
        # recompute once rather than silently serving a corrupt query
        # vector
        norms = np.linalg.norm(out[:batch], axis=1)
        valid = np.isfinite(norms) & ((np.abs(norms - 1.0) < 1e-3) | (norms == 0.0))
        if not valid.all():
            print(
                "[WARN] embed fetch failed the unit-norm invariant; "
                "recomputing once (remote-runtime early-fetch guard)"
            )
            zeros = jnp.zeros((batch_p, self.dimension), jnp.float32)
            out = np.asarray(_accumulate_and_normalize(idx_dev, wgt_dev, zeros))
            norms = np.linalg.norm(out[:batch], axis=1)
            valid = np.isfinite(norms) & (
                (np.abs(norms - 1.0) < 1e-3) | (norms == 0.0)
            )
            if not valid.all():
                raise RuntimeError("embedding fetch invalid twice")
        return out[:batch]

    def embed(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]


class HashingEmbeddingService:
    """EmbeddingService-shaped adapter over HashEmbedder (local backend;
    interface parity with reference utils/embedding_service.py:21-32)."""

    def __init__(self, dimension: int = 1536, seed: int = 7) -> None:
        self.dimension = int(dimension)
        self._embedder = HashEmbedder(dimension=dimension, seed=seed)

    def generate_embedding(self, text: str) -> List[float]:
        if not text or not str(text).strip():
            raise ValueError("text to embed must not be empty")
        return self._embedder.embed(str(text)).tolist()

    def generate_embedding_batch(self, texts: List[str]) -> List[List[float]]:
        cleaned = [str(t) for t in texts if t and str(t).strip()]
        if not texts:
            return []
        if not cleaned:
            raise ValueError("texts to embed must not be empty")
        return self._embedder.embed_batch(cleaned).tolist()
