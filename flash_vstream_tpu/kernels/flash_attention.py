"""Fused flash attention for TPU (Pallas) with segment ids and causal masking.

This replaces the reference's flash-attn / xformers CUDA kernels
(Flash-VStream-LLaVA/flash_vstream/train/llama_flash_attn_monkey_patch.py:18-117)
and the varlen `cu_seqlens` attention used by the dual-resolution Qwen2-VL ViT
batch (Flash-VStream-Qwen/models/vstream_qwen2vl_model.py:419-425). Varlen is
expressed TPU-natively as *segment ids* (equal id => may attend), which maps
to a fixed-shape mask computed per tile instead of ragged sequence handling.

Design (standard TPU flash-attention schedule):
- grid (batch, q_heads, q_blocks, kv_blocks); the kv dimension is innermost,
  so VMEM scratch (running max / denominator / output accumulator) carries
  across kv iterations.
- online softmax in f32; inputs may be bf16.
- GQA folded into the k/v index_map (kv head = q head // group), so grouped
  KV is never materialized per-q-head in HBM.
- backward: fused blockwise Pallas kernel (custom_vjp): recomputes the
  attention probabilities tile-by-tile from q/k/v plus the saved softmax
  stats and accumulates dq/dk/dv in VMEM scratch — activations are never
  materialized at [S, S] in HBM.

On non-TPU backends `flash_attention` falls back to the XLA reference so the
whole stack runs (and is tested) on the CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# XLA reference (also the CPU fallback and the backward-pass implementation)
# ---------------------------------------------------------------------------

def xla_attention(
    q: jnp.ndarray,            # [B, Hq, Sq, D]
    k: jnp.ndarray,            # [B, Hkv, Skv, D]
    v: jnp.ndarray,            # [B, Hkv, Skv, D]
    *,
    causal: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,   # [B, Sq] int32
    kv_segment_ids: Optional[jnp.ndarray] = None,  # [B, Skv] int32
    q_offset: int | jnp.ndarray = 0,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0
    g = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    # grouped einsum: q heads fold into a group axis over shared kv heads —
    # the kv cache is never materialized per-q-head (decode is HBM-bound).
    # f32 accumulate via preferred_element_type WITHOUT casting k/v: an
    # astype would materialize an f32 copy of the whole cache in HBM,
    # doubling decode's dominant read.
    qg = q.reshape(B, Hkv, g, Sq, D)
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k,
                   preferred_element_type=jnp.float32) * scale
    mask = jnp.ones((B, 1, 1, Sq, Skv), bool)
    if causal:
        qi = jnp.arange(Sq)[:, None] + q_offset
        ki = jnp.arange(Skv)[None, :]
        mask = mask & (qi >= ki)[None, None, None]
    if q_segment_ids is not None:
        seg = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
        seg = seg & (kv_segment_ids[:, None, :] >= 0)
        mask = mask & seg[:, None, None]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    # rows with no visible keys: zero them (softmax of all-masked is uniform)
    any_visible = jnp.any(mask, axis=-1, keepdims=True)
    p = jnp.where(any_visible, p, 0.0)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Hq, Sq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _flash_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_ref, m_ref, l_ref,
                  *, scale: float, causal: bool, use_segments: bool,
                  block_q: int, block_kv: int, num_kv_blocks: int):
    j = pl.program_id(3)
    qi = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Causal: skip kv blocks strictly above the diagonal (no q can see them).
    if causal:
        should_run = (qi + 1) * block_q - 1 >= j * block_kv
    else:
        should_run = True

    @pl.when(should_run)
    def _compute():
        # bf16 operands + f32 accumulation: casting q/k to f32 BEFORE the
        # dot would force the MXU into f32 mode (~1/8 of bf16 throughput)
        q = q_ref[0, 0]                              # [bq, D]
        k = k_ref[0, 0]                              # [bkv, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [bq, bkv] f32

        mask = None
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            kv_pos = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            mask = q_pos >= kv_pos
        if use_segments:
            b = pl.program_id(0)
            qseg = q_seg_ref[b]                       # [bq]
            kseg = kv_seg_ref[b]                      # [bkv]
            seg_mask = (qseg[:, None] == kseg[None, :]) & (kseg[None, :] >= 0)
            mask = seg_mask if mask is None else (mask & seg_mask)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, 0]                          # [bq]
        l_prev = l_ref[:, 0]
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:, 0]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc_ref[:] / safe_l[:, None] *
                       (l > 0)[:, None]).astype(o_ref.dtype)


def _flash_kernel_stats(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref,
                        o_ref, lse_ref, acc_ref, m_ref, l_ref, **kw):
    """Forward that additionally writes logsumexp stats (for the fused
    backward). lse layout: [B, H, Sq, 128] lane-replicated (TPU tiling)."""
    _flash_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_ref, m_ref, l_ref, **kw)
    j = pl.program_id(3)

    @pl.when(j == kw["num_kv_blocks"] - 1)
    def _write_stats():
        m = m_ref[:, 0]
        l = l_ref[:, 0]
        lse = m + jnp.log(jnp.maximum(l, 1e-30))
        lse = jnp.where(l > 0, lse, -jnp.inf)
        lse_ref[0, 0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[2:])


def _pick_block(S: int, target: int) -> int:
    """Largest block <= target that divides S (S must be a 128-multiple)."""
    b = min(target, S)
    while S % b:
        b -= 128
    return b


def _prep(q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv):
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    g = Hq // Hkv
    block_q = _pick_block(Sq, block_q)
    block_kv = _pick_block(Skv, block_kv)
    assert Sq % block_q == 0 and Skv % block_kv == 0, (
        "sequence lengths must be padded to a 128-multiple "
        f"(Sq={Sq}, Skv={Skv}, block_q={block_q}, block_kv={block_kv})")
    use_segments = q_segment_ids is not None
    if not use_segments:
        q_segment_ids = jnp.zeros((B, Sq), jnp.int32)
        kv_segment_ids = jnp.zeros((B, Skv), jnp.int32)
    return (B, Hq, Sq, D, Skv, g, block_q, block_kv, use_segments,
            q_segment_ids, kv_segment_ids)


def _pallas_flash(q, k, v, q_segment_ids, kv_segment_ids, *,
                  causal: bool, scale: float,
                  block_q: int = 1024, block_kv: int = 1024,
                  save_stats: bool = False):
    # default blocks: best of the on-chip sweep at S=8192 H32 D128 causal
    # (scripts/sweep_attention_blocks.py): 1024x1024 -> 67 TF/s vs 59 for
    # 512x1024 and 40-48 for smaller tiles; 2048-wide tiles overflow VMEM.
    (B, Hq, Sq, D, Skv, g, block_q, block_kv, use_segments,
     q_segment_ids, kv_segment_ids) = _prep(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv)
    nq, nkv = Sq // block_q, Skv // block_kv

    grid = (B, Hq, nq, nkv)
    kern = _flash_kernel_stats if save_stats else _flash_kernel
    kernel = functools.partial(
        kern, scale=scale, causal=causal, use_segments=use_segments,
        block_q=block_q, block_kv=block_kv, num_kv_blocks=nkv)

    out_specs = pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, i, j: (b, h, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if save_stats:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, block_q, 128),
                                  lambda b, h, i, j: (b, h, i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, Hq, Sq, 128), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # full batch dim (Pallas TPU blocks can't slice a batch of size
            # B>1 on the sublane dim); the kernel indexes row program_id(0)
            pl.BlockSpec((B, block_q), lambda b, h, i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_kv), lambda b, h, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, h, i, j, g=g: (b, h // g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, h, i, j, g=g: (b, h // g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q_segment_ids, kv_segment_ids, q, k, v)


# ---------------------------------------------------------------------------
# Fused backward (FlashAttention-2 style: recompute p blockwise from lse)
# ---------------------------------------------------------------------------

def _bwd_masks(qi, j, block_q, block_kv, causal, use_segments,
               q_seg_ref, kv_seg_ref, b):
    mask = None
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0)
        kv_pos = j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1)
        mask = q_pos >= kv_pos
    if use_segments:
        qseg = q_seg_ref[b]
        kseg = kv_seg_ref[b]
        seg = (qseg[:, None] == kseg[None, :]) & (kseg[None, :] >= 0)
        mask = seg if mask is None else (mask & seg)
    return mask


def _flash_bwd_dq_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, o_ref,
                         do_ref, lse_ref, dq_ref, acc_ref,
                         *, scale, causal, use_segments, block_q, block_kv,
                         num_kv_blocks):
    j = pl.program_id(3)
    qi = pl.program_id(2)
    b = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    should_run = ((qi + 1) * block_q - 1 >= j * block_kv) if causal else True

    @pl.when(should_run)
    def _compute():
        # MXU dots take bf16 operands with f32 accumulation (an f32 cast
        # before the dot would run the MXU at ~1/8 throughput); only the
        # small elementwise terms compute in f32
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        o = o_ref[0, 0]
        lse = lse_ref[0, 0, :, 0]                              # [bq]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = _bwd_masks(qi, j, block_q, block_kv, causal, use_segments,
                          q_seg_ref, kv_seg_ref, b)
        finite = jnp.isfinite(lse)[:, None]
        p = jnp.where(finite, jnp.exp(s - lse[:, None]), 0.0)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=1)                                # [bq]
        ds = p * (dp - delta[:, None]) * scale
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, o_ref,
                          do_ref, lse_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                          *, scale, causal, use_segments, block_q, block_kv,
                          num_q_blocks, group):
    # grid (B, Hkv, nkv, g, nq): the GQA group is accumulated IN-KERNEL so
    # dk/dv write once per kv head instead of once per q head
    gh = pl.program_id(3)
    i = pl.program_id(4)     # q block (innermost)
    kj = pl.program_id(2)
    b = pl.program_id(0)

    @pl.when((i == 0) & (gh == 0))
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    should_run = ((i + 1) * block_q - 1 >= kj * block_kv) if causal else True

    @pl.when(should_run)
    def _compute():
        # bf16 MXU operands, f32 accumulation (see _flash_bwd_dq_kernel)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        o = o_ref[0, 0]
        lse = lse_ref[0, 0, :, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = _bwd_masks(i, kj, block_q, block_kv, causal, use_segments,
                          q_seg_ref, kv_seg_ref, b)
        finite = jnp.isfinite(lse)[:, None]
        p = jnp.where(finite, jnp.exp(s - lse[:, None]), 0.0)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [bkv, D]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=1)
        ds = p * (dp - delta[:, None]) * scale
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [bkv, D]

    @pl.when((i == num_q_blocks - 1) & (gh == group - 1))
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _pallas_flash_bwd(q, k, v, o, do, lse, q_segment_ids, kv_segment_ids, *,
                      causal: bool, scale: float,
                      block_q: int = 1024, block_kv: int = 512):
    (B, Hq, Sq, D, Skv, g, block_q, block_kv, use_segments,
     q_segment_ids, kv_segment_ids) = _prep(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_kv)
    nq, nkv = Sq // block_q, Skv // block_kv

    common_in = [
        pl.BlockSpec((B, block_q), lambda b, h, i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, block_kv), lambda b, h, i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]

    def qspec(fn):
        return pl.BlockSpec((1, 1, block_q, D), fn, memory_space=pltpu.VMEM)

    def kvspec(fn):
        return pl.BlockSpec((1, 1, block_kv, D), fn, memory_space=pltpu.VMEM)

    # --- dq: grid (B, Hq, nq, nkv), kv innermost ---
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, causal=causal,
                          use_segments=use_segments, block_q=block_q,
                          block_kv=block_kv, num_kv_blocks=nkv),
        grid=(B, Hq, nq, nkv),
        in_specs=common_in + [
            qspec(lambda b, h, i, j: (b, h, i, 0)),
            kvspec(lambda b, h, i, j, g=g: (b, h // g, j, 0)),
            kvspec(lambda b, h, i, j, g=g: (b, h // g, j, 0)),
            qspec(lambda b, h, i, j: (b, h, i, 0)),             # o
            qspec(lambda b, h, i, j: (b, h, i, 0)),             # do
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),              # lse
        ],
        out_specs=qspec(lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q_segment_ids, kv_segment_ids, q, k, v, o, do, lse)

    # --- dk/dv: grid (B, Hkv, nkv, g, nq); the GQA group and q blocks are
    # both accumulation dims, so dk/dv write once per kv head ---
    Hkv = k.shape[1]
    q_in_kvgrid = lambda b, hk, kj, gh, i, g=g: (b, hk * g + gh, i, 0)
    kv_in_kvgrid = lambda b, hk, kj, gh, i: (b, hk, kj, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, causal=causal,
                          use_segments=use_segments, block_q=block_q,
                          block_kv=block_kv, num_q_blocks=nq, group=g),
        grid=(B, Hkv, nkv, g, nq),
        in_specs=[
            pl.BlockSpec((B, block_q), lambda b, hk, kj, gh, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_kv), lambda b, hk, kj, gh, i: (0, kj),
                         memory_space=pltpu.VMEM),
            qspec(q_in_kvgrid),
            kvspec(kv_in_kvgrid),
            kvspec(kv_in_kvgrid),
            qspec(q_in_kvgrid),                                  # o
            qspec(q_in_kvgrid),                                  # do
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b, hk, kj, gh, i, g=g: (b, hk * g + gh, i, 0),
                         memory_space=pltpu.VMEM),               # lse
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, hk, kj, gh, i: (b, hk, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, D),
                         lambda b, hk, kj, gh, i: (b, hk, kj, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, Skv, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, Skv, D), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block_kv, D), jnp.float32),
                        pltpu.VMEM((block_kv, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary", "arbitrary")),
    )(q_segment_ids, kv_segment_ids, q, k, v, o, do, lse)

    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# Public entry with custom VJP (fused fwd, fused blockwise bwd)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_core(q, k, v, q_segment_ids, kv_segment_ids,
                          causal, scale):
    return _pallas_flash(q, k, v, q_segment_ids, kv_segment_ids,
                         causal=causal, scale=scale)


def _fwd(q, k, v, q_seg, kv_seg, causal, scale):
    out, lse = _pallas_flash(q, k, v, q_seg, kv_seg, causal=causal,
                             scale=scale, save_stats=True)
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _bwd(causal, scale, res, g):
    q, k, v, q_seg, kv_seg, out, lse = res
    dq, dk, dv = _pallas_flash_bwd(q, k, v, out, g.astype(q.dtype), lse,
                                   q_seg, kv_seg, causal=causal, scale=scale)
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,            # [B, Hq, Sq, D]
    k: jnp.ndarray,            # [B, Hkv, Skv, D]
    v: jnp.ndarray,            # [B, Hkv, Skv, D]
    *,
    causal: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    q_offset: int | jnp.ndarray = 0,
    scale: Optional[float] = None,
    force_xla: bool = False,
) -> jnp.ndarray:
    """Fused attention. Segment id -1 marks padding (never attended).

    Uses the Pallas kernel on TPU when shapes are tile-aligned; otherwise the
    XLA reference (which is also the CPU path and the autodiff backward).
    `q_offset` shifts query positions for causal decode (q at positions
    [q_offset, q_offset+Sq) attending to a KV prefix) and always takes the
    XLA path (decode steps are matvecs; a fused kernel buys nothing).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    on_tpu = jax.default_backend() == "tpu"
    static_offset = isinstance(q_offset, int) and q_offset == 0
    # The fused kernel pays off for long prefills/encodes; decode steps
    # (Sq ~ 1) are bandwidth-bound matvecs where XLA is already optimal, and
    # short frame-local encodes (Qwen ViT streams: 256/64 tokens per frame)
    # measured FASTER through plain XLA attention — the [S, S] f32 scores
    # are tiny and XLA fuses them into the surrounding layer, while the
    # kernel only adds blocking/dispatch overhead (a 32-layer ingest ViT ran
    # 104 -> 121 TF/s switching these shapes to XLA). Crossover measured at
    # S ~ 512 on v5e (scripts/probe_attn_crossover.py): CLIP's 257-token
    # frames (224px) ride XLA — this took LLaVA ingest 19.2 -> 13.3 ms/clip
    # — while 336px CLIP (577 tokens) and every causal prefill stay on the
    # kernel.
    worth_fusing = q.shape[2] >= 512
    if force_xla or not on_tpu or not static_offset or not worth_fusing:
        return xla_attention(q, k, v, causal=causal,
                             q_segment_ids=q_segment_ids,
                             kv_segment_ids=kv_segment_ids,
                             q_offset=q_offset, scale=scale)

    B, Hq, Sq, D = q.shape
    Skv = k.shape[2]

    # Pad sequences only to the 128-tile granularity (e.g. CLIP's 577-token
    # frames pad to 640, not a 512-block multiple); _prep then picks block
    # sizes that divide the padded lengths.
    pad_q = 128
    pad_kv = 128

    def pad_axis(x, axis, mult, value=0.0):
        pad = (-x.shape[axis]) % mult
        if pad == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths, constant_values=value)

    # Pad head dim to the 128-lane tile (CLIP/Qwen ViT head dims are 64/80):
    # zero-padded q/k leave scores unchanged; padded v channels are sliced off.
    qp = pad_axis(pad_axis(q, 3, 128), 2, pad_q)
    kp = pad_axis(pad_axis(k, 3, 128), 2, pad_kv)
    vp = pad_axis(pad_axis(v, 3, 128), 2, pad_kv)
    if q_segment_ids is not None:
        q_seg = pad_axis(q_segment_ids, 1, pad_q, -1)
        kv_seg = pad_axis(kv_segment_ids, 1, pad_kv, -1)
    elif kp.shape[2] != Skv and not causal:
        # non-causal padding needs masking; synthesize segments
        q_seg = pad_axis(jnp.zeros((B, Sq), jnp.int32), 1, pad_q, -1)
        kv_seg = pad_axis(jnp.zeros((B, Skv), jnp.int32), 1, pad_kv, -1)
    else:
        # causal: padded kv positions sit beyond every real q position, so the
        # causal mask already excludes them.
        q_seg = kv_seg = None
    out = _flash_attention_core(qp, kp, vp, q_seg, kv_seg, causal, scale)
    return out[:, :, :Sq, :D]


def segment_ids_from_lengths(lengths: jnp.ndarray, total: int) -> jnp.ndarray:
    """Convert per-sequence lengths to a [total] segment-id vector.

    TPU-native replacement for the reference's `cu_seqlens` varlen format
    (vstream_qwen2vl_model.py:419-422): sequence i occupies segment id i;
    positions beyond sum(lengths) get id -1 (padding).
    """
    ends = jnp.cumsum(lengths)
    pos = jnp.arange(total)
    seg = jnp.sum(pos[:, None] >= ends[None, :], axis=1)
    return jnp.where(pos < ends[-1], seg, -1).astype(jnp.int32)
