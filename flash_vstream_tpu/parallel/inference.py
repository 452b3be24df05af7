"""Tensor-parallel inference: shard model weights over the 'tp' mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.4 — single-GPU loads
everywhere); on TPU, sharding the 7B decoder over a v5e-8's ICI cuts decode
latency by ~the tp degree (decode is HBM-bandwidth-bound). The model code is
plain jnp, so GSPMD propagates the weight shardings through the whole
forward; only the placement of params (and replication of inputs) is needed.
"""
from __future__ import annotations

from typing import Optional

import jax

from .sharding import LLM_RULES, create_mesh, param_shardings, replicated


def shard_params_for_inference(params, mesh=None, tp: Optional[int] = None):
    """Place a param tree on a (1, tp) mesh with TP weight sharding.

    Returns (sharded_params, mesh). Inputs to jitted functions are small
    (token ids / embeddings), so they can stay unsharded — GSPMD inserts the
    collectives (all-gather on qkv outputs, reduce-scatter after wo/down).
    """
    if mesh is None:
        n = len(jax.devices()) if tp is None else tp
        mesh = create_mesh(dp=1, tp=n)
    shardings = param_shardings(mesh, params)
    with mesh:
        sharded = jax.jit(lambda p: p, out_shardings=shardings)(params)
    return sharded, mesh
