"""Pairwise distance/similarity primitives, written as matmuls for the MXU.

Reference semantics: `efficient_euclidean_distance` / `cosine_similarity` in
Flash-VStream-Qwen/models/compress_functions.py:191-201 and
models/vstream_qwen2vl_model.py:184-201. Rebuilt TPU-first: a single
`x2 + c2 - 2 x.c^T` expansion so the O(n*m*d) work is one MXU matmul instead of
a broadcast-subtract (which would materialize an [n, m, d] intermediate in HBM).
"""
from __future__ import annotations

import jax.numpy as jnp


def sq_euclidean_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance matrix. a: [n, d], b: [m, d] -> [n, m].

    All products accumulate in f32 via preferred_element_type WITHOUT
    casting the operands first: an .astype(f32) before the dot both
    materializes an f32 copy of the operand in HBM (b is the full pooled
    bank in DAM retrieval — 168 MB bf16, 336 MB cast) and drops the MXU to
    its f32 rate (~1/8 of bf16). f32 inputs take the identical path.
    """
    a2 = jnp.einsum("nd,nd->n", a, a,
                    preferred_element_type=jnp.float32)[:, None]   # [n, 1]
    b2 = jnp.einsum("md,md->m", b, b,
                    preferred_element_type=jnp.float32)[None, :]   # [1, m]
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)  # [n, m] (MXU)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def euclidean_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix (sqrt of sq_euclidean_distance)."""
    return jnp.sqrt(sq_euclidean_distance(a, b))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return x.astype(jnp.float32) / jnp.maximum(norm, eps)


def cosine_similarity_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity matrix. a: [n, d], b: [m, d] -> [n, m]."""
    an = l2_normalize(a)
    bn = l2_normalize(b)
    return jnp.dot(an, bn.T, preferred_element_type=jnp.float32)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rowwise cosine similarity between a and b of identical shape [..., d].

    Matches torch.nn.functional.cosine_similarity clamping semantics
    (denominator clamped at eps).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    return dot / jnp.maximum(na * nb, eps)
