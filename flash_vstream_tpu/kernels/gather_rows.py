"""Pallas dynamic row gather: out[i] = bank[idx[i]].

The DAM retrieval gathers ~30 full-resolution frames ([P, D] rows of
~650 KB) out of the streaming ring buffer every ingest (reference
spatial_enhance, Flash-VStream-Qwen/vstream_qwen2vl_model.py:228-244).
XLA lowers `bank[idx]` to a gather that measured 12-15 GB/s effective on
this chip; a scalar-prefetch grid (indices in SMEM drive each step's input
BlockSpec, one HBM->VMEM DMA per row, double-buffered by the pipeline)
measures 36-66 GB/s — 3-4.4x faster (scripts/probe_bank_gather.py).

vmap (the multi-stream engine) falls back to XLA's gather: batching a
scalar-prefetch grid is not supported, and the engine amortizes its launch
over streams anyway.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(idx_ref, bank_ref, out_ref):
    del idx_ref                      # consumed by the input index map
    out_ref[...] = bank_ref[...]


def _pallas_gather(bank: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    (k,) = idx.shape
    _, p, d = bank.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[pl.BlockSpec((1, p, d), lambda g, idx: (idx[g], 0, 0))],
        out_specs=pl.BlockSpec((1, p, d), lambda g, idx: (g, 0, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, p, d), bank.dtype),
    )(idx.astype(jnp.int32), bank)


@jax.custom_batching.custom_vmap
def gather_rows(bank: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """bank [T, P, D], idx [K] int -> [K, P, D]. idx must be in-range
    (callers clamp; the streaming update's indices are argmax/argsort
    products, in-range by construction)."""
    if (jax.default_backend() == "tpu" and bank.ndim == 3
            and idx.ndim == 1
            and bank.shape[1] % 8 == 0 and bank.shape[2] % 128 == 0):
        return _pallas_gather(bank, idx)
    return jnp.take(bank, idx, axis=0)


@gather_rows.def_vmap
def _gather_rows_vmap(axis_size, in_batched, bank, idx):
    bank_b, idx_b = in_batched
    if not bank_b and not idx_b:
        return gather_rows(bank, idx), False
    # batched (multi-stream engine): XLA's batched gather
    bdim = lambda x, b: x if b else jnp.broadcast_to(
        x[None], (axis_size, *x.shape))
    bank = bdim(bank, bank_b)
    idx = bdim(idx, idx_b)
    out = jnp.take_along_axis(
        bank, idx[:, :, None, None].astype(jnp.int32), axis=1)
    return out, True
