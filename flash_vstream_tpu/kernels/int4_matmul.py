"""Pallas int4 weight matmul for the decode hot path.

Decode matvecs are weight-HBM-read bound (the reference serves its 7B over
CUDA fp16/bnb; here int8 weights already run decode at ~85% of the HBM
roofline). int4 halves the remaining weight bytes — but XLA cannot fuse the
nibble unpack into a dot operand feed (it materializes the dequantized
matrix: measured 19x SLOWER than int8, scripts/probe_int4_matvec.py), and
jnp.int4 arrays cannot cross a jit boundary on this backend. So this kernel
reads the PACKED uint8 bytes (0.5 bytes/weight of HBM traffic), unpacks and
block-scales in VMEM, and runs the bf16 dot on the MXU.

Layout contract (weights/quantize.QuantWeight4, split-half BIASED packing):
  q4    [din//2, dout] uint8 — low nibble = row i, high = row i + din//2;
                               nibble stores q+8 in [1, 15] (value = n - 8)
  scale [nb, dout] f32      — nb input blocks of size din//nb

The kernel is VPU-bound (the dot is a matvec; the HBM read is half an
int8's), so the per-element work is pared to mask+convert (~2 ops/element):
the BIASED nibble (q+8, exact in bf16) goes straight onto the MXU, and
both the bias and the block scales correct the [nb, B, blk] PARTIAL sums
instead of touching the [din, blk] weight tile:
  y = sum_b s_b * (x_b @ n_b - 8 * sum(x_b)).
A first version that sign-extended and scaled per element measured
0.217 ms/matvec at [3584, 18944] — ~7 VPU ops/element, slower than int8.

Measured at [1,3584]@[3584,18944] (Qwen-7B mlp up, chained-scan fenced,
best-of-4, scripts/probe_int4_variants.py): bias-fold kernel 0.155
ms/matvec vs 0.134 int8, 0.222 bf16, 0.847 XLA dequant of the same
packing; per-element unbias (-8.0) measured 0.182; a bare unpack+dot
floor is 0.136 — the unpack VPU work, not HBM, binds, so int8 remains the
latency-optimal SERVING format. This kernel exists so the memory-optimal
int4 base (7B QLoRA training on one 16 GB chip) decodes at 5.5x the
XLA-dequant rate instead of paying 0.847 ms/matvec.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int4_matvec_kernel(x_ref, w4_ref, scale_ref, out_ref, *, nb: int):
    """One dout block: out[B, blk] = x[B, din] @ dequant(w4[dh, blk]).

    nb = number of scale blocks over the FULL din (must be even so each
    half holds nb//2 whole blocks).
    """
    b = w4_ref[...].astype(jnp.int32)           # [dh, blk] (no u8->bf16 cast
    n_lo = (b & 15).astype(jnp.bfloat16)        #  in Mosaic; i32 lanes are
    n_hi = (b >> 4).astype(jnp.bfloat16)        #  the native width anyway)
    dh, blk = b.shape                           # nibbles stay BIASED [1, 15]
    nbh = nb // 2
    bs = dh // nbh
    s = scale_ref[...]                          # [nb, blk] f32
    # static slices + reshape (s[:nbh, None, :]-style mixed indexing lowers
    # to an unsupported gather in Mosaic)
    s_lo = jax.lax.slice_in_dim(s, 0, nbh, axis=0).reshape(nbh, 1, blk)
    s_hi = jax.lax.slice_in_dim(s, nbh, nb, axis=0).reshape(nbh, 1, blk)

    x = x_ref[...]                              # [B, din] bf16
    B = x.shape[0]

    if B == 1:
        # True decode matvec: the nibbles go onto the MXU still BIASED
        # (values q+8 in [1, 15] are exact in bf16) and the bias corrects
        # per BLOCK as 8 * sum(x_b) — so per-element work is just
        # mask+convert (~2 VPU ops; the -8.0 per element measured +17%:
        # 0.182 -> 0.155 ms at [3584, 18944]). Scales likewise apply to
        # the [nbh, 1, blk] PARTIAL sums. Reshaping [1, dh] ->
        # [nbh, 1, bs] is free (row-major identity when B == 1), which
        # puts the block axis LEADING on both dot operands — Mosaic
        # requires batch dims at equal positions.
        x_lo = jax.lax.slice_in_dim(x, 0, dh, axis=1).reshape(nbh, 1, bs)
        x_hi = jax.lax.slice_in_dim(x, dh, 2 * dh, axis=1).reshape(nbh, 1, bs)
        c_lo = 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=2, keepdims=True)
        c_hi = 8.0 * jnp.sum(x_hi.astype(jnp.float32), axis=2, keepdims=True)

        def partial(xh, n):                     # -> [nbh, 1, blk] f32
            n3 = n.reshape(nbh, bs, blk)
            return jax.lax.dot_general(
                xh, n3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        p = ((partial(x_lo, n_lo) - c_lo) * s_lo
             + (partial(x_hi, n_hi) - c_hi) * s_hi)
        acc = jnp.sum(p, axis=0)                # [1, blk]
    else:
        # Small-batch verify path (speculative decode): fold the scales
        # into the weight halves per element (+1 VPU multiply) and run two
        # plain [B, dh] @ [dh, blk] dots — no batch dims for Mosaic to
        # object to, and B amortizes the dequant across rows.
        def widen(sh):                          # [nbh, 1, blk] -> [dh, blk]
            return jnp.broadcast_to(
                sh, (nbh, bs, blk)).reshape(dh, blk).astype(jnp.bfloat16)

        x_lo = jax.lax.slice_in_dim(x, 0, dh, axis=1)
        x_hi = jax.lax.slice_in_dim(x, dh, 2 * dh, axis=1)
        acc = (jnp.dot(x_lo, (n_lo - 8.0) * widen(s_lo),
                       preferred_element_type=jnp.float32)
               + jnp.dot(x_hi, (n_hi - 8.0) * widen(s_hi),
                         preferred_element_type=jnp.float32))
    out_ref[...] = acc.astype(out_ref.dtype)


def _pick_block(dout: int) -> int:
    for blk in (512, 384, 256, 128):
        if dout % blk == 0:
            return blk
    return 0


def int4_matmul_supported(x_rows: int, dh: int, nb: int, dout: int) -> bool:
    """Shapes the kernel handles: small row count (decode/spec-decode), a
    packed half that splits into whole sublane-aligned scale blocks, and a
    dout divisible by a 128-multiple block."""
    return (x_rows <= 32
            and nb % 2 == 0
            and dh % (nb // 2) == 0
            and (dh // (nb // 2)) % 8 == 0     # f32 sublane tile inside half
            and dh % 32 == 0                   # uint8 sublane tile
            and _pick_block(dout) > 0)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def int4_matmul(x: jnp.ndarray, q4: jnp.ndarray, scale: jnp.ndarray,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x [B, din] (bf16) @ packed-int4 [din//2, dout] -> [B, dout].

    B must be small (decode steps); callers gate on int4_matmul_supported.
    """
    B, din = x.shape
    dh, dout = q4.shape
    nb = scale.shape[0]
    assert din == 2 * dh, (x.shape, q4.shape)
    blk = _pick_block(dout)
    grid = (dout // blk,)
    kernel = functools.partial(_int4_matvec_kernel, nb=nb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, din), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, blk), lambda o: (0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, blk), lambda o: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, blk), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, dout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x.astype(jnp.bfloat16), q4, scale.astype(jnp.float32))
