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

# default targets: every attention/mlp projection of the DECODER only —
# anchored so "vit/layers/attn/..." never matches (the reference excludes
# the vision tower from LoRA, finetune_flash.py:544-554)
DEFAULT_TARGETS = (
    r"^(llm/)?layers/attn/w[qkvo]/w$",
    r"^(llm/)?layers/mlp/(gate|up|down)/w$",
)
QWEN_TARGETS = DEFAULT_TARGETS + (r"merger/fc[12]/w$",)


def is_lora_target(path: str, targets: Sequence[str]) -> bool:
    return any(re.search(t, path) for t in targets)


def _is_weight_leaf(x) -> bool:
    """Treat int8/int4 Quant weights as ONE leaf so a quantized base tree
    adapts the same way a bf16 one does (QLoRA: the reference's bnb 4/8-bit
    load + peft LoRA, train/train.py:877-894 + 926-942)."""
    from ..weights.quantize import QuantWeight, QuantWeight4
    return isinstance(x, (QuantWeight, QuantWeight4))


def _weight_shape(x):
    if hasattr(x, "q4"):           # packed pairs along the input axis
        *lead, half, dout = x.q4.shape
        return (*lead, half * 2, dout)
    return x.q.shape if hasattr(x, "q") else x.shape


def init_lora_params(key: jax.Array, params, rank: int,
                     targets: Sequence[str] = DEFAULT_TARGETS,
                     dtype=jnp.float32):
    """Adapter tree: for each targeted weight [..., din, dout], a: [..., din, r]
    (gaussian / sqrt(r)) and b: [..., r, dout] (zeros), matching peft init.
    Works over bf16 and weight-only-int8 (QLoRA) base trees."""
    flat = {}
    leaves = jax.tree_util.tree_leaves_with_path(params,
                                                 is_leaf=_is_weight_leaf)
    keys = jax.random.split(key, len(leaves))
    for (path, x), k in zip(leaves, keys):
        p = path_str(path)
        shape = _weight_shape(x)
        if not is_lora_target(p, targets) or len(shape) < 2:
            continue
        *lead, din, dout = shape
        a = jax.random.normal(k, (*lead, din, rank), dtype) / jnp.sqrt(rank)
        b = jnp.zeros((*lead, rank, dout), dtype)
        flat[p] = {"a": a, "b": b}
    return flat


from typing import NamedTuple


class LoRAWeight(NamedTuple):
    """(w, a, b) view consumed by layers.dense WITHOUT materializing
    w + (alpha/r) a@b: the dense computes x@w + (x@a)@b, with the
    (alpha/r) scale pre-folded into `a` at view time, so

    - no merged full-size parameter copy lives in HBM (at 2B+ the merged
      tree plus its full-size cotangents under grad OOMed one chip),
    - under jax.grad wrt the adapter tree, the base-w branch has no grad
      consumer and is pruned — backward touches only the rank-r factors,
    - every field has the stacked [L, ...] leading axis, so the tree scans
      over layers like plain weights.

    NamedTuple => pytree whose type survives tree operations (same pattern
    as weights/quantize.QuantWeight).
    """
    w: jnp.ndarray
    a: jnp.ndarray       # pre-scaled by alpha/rank
    b: jnp.ndarray


def lora_views(params, lora: Dict[str, dict], alpha: float, rank: int):
    """Effective tree with LoRAWeight views at adapted leaves (merge-free;
    preferred inside training steps). Base arrays are referenced, not
    copied; only the rank-r `a` factor is scaled (a tiny copy).

    The base tree is stop_gradient'ed: without it, differentiating through
    the scan-over-layers materializes stacked [L, din, dout] cotangent
    buffers for every base weight (gigabytes of HLO temps — OOMed a 2B
    LoRA step) even though no base gradient is ever consumed."""
    scale = alpha / rank
    params = jax.lax.stop_gradient(params)

    def one(path, x):
        p = path_str(path)
        ab = lora.get(p)
        if ab is None:
            return x
        return LoRAWeight(x, ab["a"] * scale, ab["b"])

    return jax.tree_util.tree_map_with_path(one, params,
                                            is_leaf=_is_weight_leaf)


def merge_lora(params, lora: Dict[str, dict], alpha: float, rank: int):
    """Effective params: w + (alpha/rank) * a @ b at each adapted leaf
    (materialized — use for export; training steps use lora_views).
    Quantized leaves dequantize before merging (QLoRA export)."""
    scale = alpha / rank

    def one(path, x):
        p = path_str(path)
        ab = lora.get(p)
        if ab is None:
            return x
        if hasattr(x, "q"):
            from ..weights.quantize import dequantize_weight
            x = dequantize_weight(x, dtype=ab["a"].dtype)
        elif hasattr(x, "q4"):
            from ..weights.quantize import dequantize_weight4
            x = dequantize_weight4(x, dtype=ab["a"].dtype)
        delta = jnp.einsum("...ir,...ro->...io", ab["a"], ab["b"]) * scale
        return x + delta.astype(x.dtype)

    return jax.tree_util.tree_map_with_path(one, params,
                                            is_leaf=_is_weight_leaf)


def merge_lora_into_weights(params, lora, alpha: float, rank: int):
    """Materialize merged weights for export (reference merge_lora_weights.py)."""
    return jax.tree.map(lambda x: x, merge_lora(params, lora, alpha, rank))
