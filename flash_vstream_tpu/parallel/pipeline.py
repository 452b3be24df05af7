"""Pipeline parallelism: GPipe-style microbatch schedule over a 'pp' mesh axis.

Beyond the reference (DeepSpeed ZeRO only, single node — SURVEY.md §2.4,
§5.8): stage i holds layers [i*L/S, (i+1)*L/S) of the stacked decoder tree,
microbatches flow stage-to-stage over ICI via `ppermute`, and the backward
pipeline falls out of jax autodiff (the transpose of ppermute is the reverse
ppermute), so one `jax.grad` of this forward IS the GPipe backward schedule.

TPU-native design notes:
- the schedule is a `lax.scan` over T = n_micro + n_stages - 1 ticks; every
  stage computes every tick (fixed shapes, no data-dependent control flow) —
  bubble ticks process garbage that is masked at collection time, which is
  the XLA-friendly formulation of the pipeline bubble (compute is wasted,
  exactly like the real bubble).
- activations cross stages with `ppermute` (ICI neighbor exchange). With the
  stages laid out contiguously on the mesh this is a ring shift: bandwidth
  optimal, no host involvement.
- layer weights are sharded over 'pp' on the stacked layer axis L (each
  device materializes only L/S layers — pipeline parallelism's memory win),
  expressed through shard_map in_specs, not manual scatter.

The embed / final-norm / lm-head run replicated on every stage (they are
tiny next to the layer stack); production placement would pin them to the
first/last stage, which changes memory, not math.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import LLMConfig


def create_pp_mesh(pp: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    pp = pp or len(devices)
    return Mesh(np.asarray(devices[:pp]), ("pp",))


def pipeline_decoder_forward(
    params: dict,                  # full LLM tree (stacked layers [L, ...])
    cfg: LLMConfig,
    input_embeds: jnp.ndarray,     # [B, S, D]
    positions: jnp.ndarray,        # [B, S] or [3, B, S]
    *,
    mesh: Mesh,
    n_micro: int,
    segment_ids: Optional[jnp.ndarray] = None,   # [B, S]; -1 = padding
    remat: bool = True,
) -> jnp.ndarray:
    """Pipelined no-cache decoder stack; returns final hidden [B, S, D]
    (post final_norm), numerically equal to `decoder_forward` (test-pinned).

    The batch splits into `n_micro` microbatches along dim 0; sequences are
    never split, so causal masking inside a microbatch is unchanged.
    """
    from ..models.llm import _rope_for, decoder_block
    from ..models.layers import rms_norm

    n_stages = mesh.shape["pp"]
    L = cfg.num_layers
    assert L % n_stages == 0, f"layers {L} % stages {n_stages} != 0"
    B, S, D = input_embeds.shape
    assert B % n_micro == 0, f"batch {B} % n_micro {n_micro} != 0"
    Bm = B // n_micro
    T = n_micro + n_stages - 1

    cos, sin = _rope_for(cfg, positions)         # [B, S, hd] (batch-leading)
    xm = input_embeds.reshape(n_micro, Bm, S, D)
    cosm = cos.reshape(n_micro, Bm, *cos.shape[1:])
    sinm = sin.reshape(n_micro, Bm, *sin.shape[1:])
    segm = (segment_ids.reshape(n_micro, Bm, S)
            if segment_ids is not None else None)

    layers = params["layers"]

    def run(stage_layers, xm, cosm, sinm, segm):
        # inside shard_map over 'pp': stage_layers leaves are the LOCAL
        # [L/S, ...] slice; data args are replicated
        stage = jax.lax.axis_index("pp")
        last = n_stages - 1

        def stage_fn(x, cs, sn, seg):
            def body(x, lp):
                return decoder_block(x, lp, cfg, cs, sn,
                                     segment_ids=seg), None
            blk = jax.checkpoint(body) if remat else body
            x, _ = jax.lax.scan(blk, x, stage_layers)
            return x

        def tick(carry, t):
            act, ys = carry
            mb = jnp.clip(t - stage, 0, n_micro - 1)   # my microbatch index
            inp = jnp.where(stage == 0, xm[jnp.clip(t, 0, n_micro - 1)], act)
            seg = None if segm is None else segm[mb]
            out = stage_fn(inp, cosm[mb], sinm[mb], seg)
            # collect BEFORE the shift: the last stage's out at tick t is
            # microbatch t - last (valid once the pipeline has filled)
            done = t - last
            valid = (stage == last) & (done >= 0)
            slot = jnp.clip(done, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(ys, slot, 0, keepdims=False)
            ys = jax.lax.dynamic_update_index_in_dim(
                ys, jnp.where(valid, out, cur), slot, 0)
            nxt = jax.lax.ppermute(
                out, "pp", [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (nxt, ys), None

        init = (jnp.zeros((Bm, S, D), input_embeds.dtype),
                jnp.zeros((n_micro, Bm, S, D), input_embeds.dtype))
        (_, ys), _ = jax.lax.scan(tick, init, jnp.arange(T))
        # broadcast the last stage's collected outputs to every stage
        ys = jax.lax.psum(
            jnp.where(stage == last, ys, jnp.zeros_like(ys)), "pp")
        return ys

    shard_map = jax.shard_map
    layer_specs = jax.tree.map(lambda _: P("pp"), layers)
    seg_args = (segm,) if segm is not None else ()

    def wrapped(stage_layers, xm, cosm, sinm, *seg):
        return run(stage_layers, xm, cosm, sinm, seg[0] if seg else None)

    # composition with other mesh axes (dp x pp training): only 'pp' is
    # manual here; remaining axes (dp/tp) stay automatic, so the outer
    # pjit's batch/ZeRO shardings pass through untouched
    extra = ({"axis_names": {"pp"}} if set(mesh.axis_names) != {"pp"}
             else {})
    ys = shard_map(
        wrapped, mesh=mesh,
        in_specs=(layer_specs, P(), P(), P()) + ((P(),) if segm is not None
                                                 else ()),
        out_specs=P(),
        check_vma=False,
        **extra,
    )(layers, xm, cosm, sinm, *seg_args)

    h = ys.reshape(B, S, D)
    return rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
