"""Key-frame retrieval ops (STAR retrieved memory, Flash DAM memory).

Reference semantics:
- STAR key-frame retrieval (vstream_arch.py:260-269): take the top-key_length
  clusters by weight, find the frame nearest each centroid, splice those
  full-resolution frames in front of the current memory.
  NOTE: the reference literally indexes the *uncompressed* frame list with
  cluster-weight-sorted cluster ids (`long_memory[sorted_indices]`,
  vstream_arch.py:262) — an indexing quirk; we implement the documented
  intent (centroids as queries), see `star_retrieve`.
- Flash DAM retrieval / spatial_enhance (vstream_qwen2vl_model.py:182-244):
  top-spatial_length clusters by weight; for each, argmin distance over the
  pooled feature bank; gather full-res frames and their bank positions.

Both are one argsort + one MXU distance matmul + one argmin + one gather.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .distances import cosine_similarity_matrix, sq_euclidean_distance


def topk_by_weight(weights: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k largest weights, in descending-weight order
    (matches torch.argsort(descending=True)[:k])."""
    return jnp.argsort(-weights)[:k]


def retrieve_nearest_frames(
    centroids: jnp.ndarray,      # [k, Dq] queries (flattened cluster feats)
    bank: jnp.ndarray,           # [T, Dq] pooled per-frame features
    bank_valid: jnp.ndarray,     # [T] bool
    metric: str = "euclidean",
) -> jnp.ndarray:
    """For each centroid, the index of the nearest valid bank frame. [k] int32."""
    if metric == "euclidean":
        d = sq_euclidean_distance(centroids, bank)           # [k, T]
        d = jnp.where(bank_valid[None, :], d, jnp.inf)
        return jnp.argmin(d, axis=1).astype(jnp.int32)
    elif metric == "cosine":
        s = cosine_similarity_matrix(centroids, bank)
        s = jnp.where(bank_valid[None, :], s, -jnp.inf)
        # reference klarge_retrieve_cos also uses argmin on the similarity
        # matrix (vstream_qwen2vl_model.py:236) — i.e. the LEAST similar frame.
        # We match that literal behavior for parity.
        return jnp.argmin(s, axis=1).astype(jnp.int32)
    raise ValueError(f"unknown metric {metric}")


def star_retrieve(
    cluster_centroids: jnp.ndarray,   # [L, Dp] compressed long-memory clusters
    cluster_weights: jnp.ndarray,     # [L]
    pooled_bank: jnp.ndarray,         # [T, Dp] spatially pooled frames
    bank_valid: jnp.ndarray,          # [T]
    key_length: int,
) -> jnp.ndarray:
    """STAR retrieved-memory frame indices: nearest frames to the
    key_length heaviest clusters. Returns [key_length] int32 frame indices."""
    top = topk_by_weight(cluster_weights, key_length)
    queries = cluster_centroids[top]
    return retrieve_nearest_frames(queries, pooled_bank, bank_valid)


def dam_retrieve(
    tem_x: jnp.ndarray,          # [K, P, D] CSM cluster features
    tem_weights: jnp.ndarray,    # [K]
    small_bank: jnp.ndarray,     # [T, P, D] pooled feature bank
    bank_valid: jnp.ndarray,     # [T]
    spatial_length: int,
    metric: str = "euclidean",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flash DAM retrieval (klarge_retrieve): returns (frame_indices
    [spatial_length], None placeholder kept for API symmetry).

    Mirrors spatial_enhance (vstream_qwen2vl_model.py:228-238): the
    spatial_length heaviest CSM clusters query the pooled bank; each picks its
    nearest frame.
    """
    K, P, D = tem_x.shape
    top = topk_by_weight(tem_weights, spatial_length)
    queries = tem_x[top].reshape(spatial_length, P * D)
    bank2d = small_bank.reshape(small_bank.shape[0], -1)
    idx = retrieve_nearest_frames(queries, bank2d, bank_valid, metric)
    return idx, top
