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


class QuantWeight4(NamedTuple):
    """Packed 4-bit weight (QLoRA base precision — the reference fine-tunes
    over a bitsandbytes 4-bit base, Flash-VStream-Qwen/finetune_flash.py
    QLoRA path). Symmetric int4 with per-(input-block, output-channel)
    scales: 4-bit alone is too coarse per-channel, the block dimension
    recovers most of nf4's fidelity with multiply-only dequant (no codebook
    gather on the TPU hot path).

    q4:    uint8 [..., din//2, dout] — input-axis rows packed split-half per
           byte (low nibble = row i, high nibble = row i + din//2): the
           unpack is a concat, not an interleave, so both the XLA dequant
           and the Pallas decode-matvec kernel (kernels/int4_matmul.py)
           avoid any lane shuffle. Nibbles store the BIASED value q+8 in
           [1, 15] (not two's complement): value = nibble - 8, so the
           kernel's unpack is mask+convert and the constant bias folds
           into a per-block correction term instead of a per-element op.
    scale: f32   [..., nb, dout] — nb input blocks of size din//nb
    """
    q4: jnp.ndarray
    scale: jnp.ndarray

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


def _block_size4(din: int, block: int) -> int:
    """Largest EVEN divisor of din <= block (pairs pack within a block)."""
    bs = min(block, din)
    while bs > 2 and (din % bs or bs % 2):
        bs -= 1
    return bs


def quantize_weight4(w: jnp.ndarray, block: int = 128) -> QuantWeight4:
    """Symmetric int4 ([-7, 7]) over input blocks x output channels."""
    *lead, din, dout = w.shape
    bs = _block_size4(din, block)
    nb = din // bs
    wf = w.astype(jnp.float32).reshape(*lead, nb, bs, dout)
    amax = jnp.max(jnp.abs(wf), axis=-2)                     # [..., nb, dout]
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7)
    q = (q + 8).reshape(*lead, din, dout).astype(jnp.uint8)  # biased [1, 15]
    half = din // 2
    lo = q[..., :half, :]
    hi = q[..., half:, :]
    return QuantWeight4(lo | (hi << 4), scale)


def unpack_weight4(qw: QuantWeight4) -> jnp.ndarray:
    """Packed biased nibbles -> int8 [..., din, dout] in [-7, 7]
    (split-half packing makes this a concat, not an interleave)."""
    b = qw.q4
    lo = (b & 0xF).astype(jnp.int8) - 8
    hi = (b >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize_weight4(qw: QuantWeight4, dtype=jnp.bfloat16) -> jnp.ndarray:
    *lead, nb, dout = qw.scale.shape
    q = unpack_weight4(qw)
    din = q.shape[-2]
    q = q.reshape(*lead, nb, din // nb, dout).astype(jnp.float32)
    w = q * qw.scale[..., :, None, :]
    return w.reshape(*lead, din, dout).astype(dtype)


def quantize_params4(params, targets: Sequence[str] = DEFAULT_QUANT_TARGETS,
                     block: int = 128):
    """4-bit variant of quantize_params: targeted >=2D weights with an EVEN
    input dim become QuantWeight4 (others pass through untouched)."""
    def one(path, x):
        p = path_str(path)
        if (getattr(x, "ndim", 0) >= 2 and x.shape[-2] % 2 == 0
                and any(re.search(t, p) for t in targets)):
            return quantize_weight4(x, block=block)
        return x
    return jax.tree_util.tree_map_with_path(one, params)


def enable_w8a8_prefill(on: bool = True):
    """Opt into int8xint8 MXU matmuls for prefill-scale QuantWeight dots
    (2x the bf16 MXU rate on v5e; activations quantize per-token on the
    fly). Logits drift slightly vs weight-only int8 — off by default; set
    BEFORE building any jitted program (the flag is read at trace time)."""
    from ..models import layers
    layers.W8A8_PREFILL = bool(on)
