"""Weight-only int8 quantization.

TPU-native replacement for the reference's bitsandbytes 4/8-bit loading
(Flash-VStream-LLaVA/flash_vstream/model/builder.py:35-44): targeted matmul
weights are stored as int8 with per-output-channel scales; the dequant folds
into the matmul's operand feed, so HBM traffic (the decode bottleneck) halves
versus bf16 — and a 7B model + ViT fits one 16 GB v5e chip.
"""
from __future__ import annotations

import re
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..parallel.sharding import path_str


class QuantWeight(NamedTuple):
    """NamedTuple => automatically a pytree; flows through jit/sharding."""
    q: jnp.ndarray       # int8, same shape as the original weight
    scale: jnp.ndarray   # f32 [..., 1, dout] per-output-channel

DEFAULT_QUANT_TARGETS = (
    r"layers/attn/w[qkvo]/w$",
    r"layers/mlp/(gate|up|down|fc1|fc2)/w$",
    r"^lm_head$", r"/lm_head$",
)


def quantize_weight(w: jnp.ndarray) -> QuantWeight:
    """Symmetric per-output-channel int8 over the last (output) axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)     # [..., 1, dout]
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantWeight(q, scale)


def quantize_params(params, targets: Sequence[str] = DEFAULT_QUANT_TARGETS):
    """Quantize targeted >=2D weights in a param tree; other leaves pass
    through. The result plugs into the same model code (layers.dense
    dispatches on QuantWeight)."""
    def one(path, x):
        p = path_str(path)
        if x.ndim >= 2 and any(re.search(t, p) for t in targets):
            return quantize_weight(x)
        return x
    return jax.tree_util.tree_map_with_path(one, params)


def dequantize_weight(qw: QuantWeight, dtype=jnp.float32) -> jnp.ndarray:
    return (qw.q.astype(jnp.float32) * qw.scale).astype(dtype)


def enable_w8a8_prefill(on: bool = True):
    """Opt into int8xint8 MXU matmuls for prefill-scale QuantWeight dots
    (2x the bf16 MXU rate on v5e; activations quantize per-token on the
    fly). Logits drift slightly vs weight-only int8 — off by default; set
    BEFORE building any jitted program (the flag is read at trace time)."""
    from ..models import layers
    layers.W8A8_PREFILL = bool(on)
