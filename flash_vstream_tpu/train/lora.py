"""LoRA adapters as a separate param pytree.

Reference: peft LoRA over all LLM proj layers + visual.merger.mlp (Qwen,
finetune_flash.py:544-578) and the LLaVA lora_enable path
(train/train.py:926-942).

Functional design: adapters live in their own tree mirroring the base params'
structure ({"a": [.., din, r], "b": [.., r, dout]}); `merge_lora` produces
effective weights w + (alpha/r) * a @ b inside the jitted step, so the base
tree stays frozen and only the adapter tree receives gradients.
"""
from __future__ import annotations

import re
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..parallel.sharding import path_str

# default targets: every attention/mlp projection of the decoder
DEFAULT_TARGETS = (
    r"layers/attn/w[qkvo]/w$",
    r"layers/mlp/(gate|up|down)/w$",
)
QWEN_TARGETS = DEFAULT_TARGETS + (r"merger/fc[12]/w$",)


def is_lora_target(path: str, targets: Sequence[str]) -> bool:
    return any(re.search(t, path) for t in targets)


def init_lora_params(key: jax.Array, params, rank: int,
                     targets: Sequence[str] = DEFAULT_TARGETS,
                     dtype=jnp.float32):
    """Adapter tree: for each targeted weight [..., din, dout], a: [..., din, r]
    (gaussian / sqrt(r)) and b: [..., r, dout] (zeros), matching peft init."""
    flat = {}
    leaves = jax.tree_util.tree_leaves_with_path(params)
    keys = jax.random.split(key, len(leaves))
    for (path, x), k in zip(leaves, keys):
        p = path_str(path)
        if not is_lora_target(p, targets) or x.ndim < 2:
            continue
        *lead, din, dout = x.shape
        a = jax.random.normal(k, (*lead, din, rank), dtype) / jnp.sqrt(rank)
        b = jnp.zeros((*lead, rank, dout), dtype)
        flat[p] = {"a": a, "b": b}
    return flat


def merge_lora(params, lora: Dict[str, dict], alpha: float, rank: int):
    """Effective params: w + (alpha/rank) * a @ b at each adapted leaf."""
    scale = alpha / rank

    def one(path, x):
        p = path_str(path)
        ab = lora.get(p)
        if ab is None:
            return x
        delta = jnp.einsum("...ir,...ro->...io", ab["a"], ab["b"]) * scale
        return x + delta.astype(x.dtype)

    return jax.tree_util.tree_map_with_path(one, params)


def merge_lora_into_weights(params, lora, alpha: float, rank: int):
    """Materialize merged weights for export (reference merge_lora_weights.py)."""
    return jax.tree.map(lambda x: x, merge_lora(params, lora, alpha, rank))
