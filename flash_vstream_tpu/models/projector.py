"""Vision->LLM projector.

Reference: build_vision_projector
(Flash-VStream-LLaVA/flash_vstream/model/multimodal_projector/builder.py:35-51):
'linear', 'mlp{N}x_gelu', or 'identity'.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp

from ..core.config import ProjectorConfig
from .layers import dense, init_dense


def init_projector_params(key: jax.Array, cfg: ProjectorConfig,
                          dtype=jnp.float32) -> dict:
    din, dout = cfg.effective_input_dim, cfg.output_dim
    if cfg.projector_type == "identity":
        return {}
    if cfg.projector_type == "linear":
        return {"layers": [init_dense(key, din, dout, bias=True, dtype=dtype)]}
    m = re.match(r"^mlp(\d+)x_gelu$", cfg.projector_type)
    if not m:
        raise ValueError(f"unknown projector type {cfg.projector_type}")
    depth = int(m.group(1))
    keys = jax.random.split(key, depth)
    layers = [init_dense(keys[0], din, dout, bias=True, dtype=dtype)]
    for i in range(1, depth):
        layers.append(init_dense(keys[i], dout, dout, bias=True, dtype=dtype))
    return {"layers": layers}


def project(params: dict, cfg: ProjectorConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.projector_type == "identity":
        return x
    layers = params["layers"]
    w0 = layers[0]["w"]
    if x.dtype == jnp.float32:
        # STAR memory banks are f32 (clustering numerics); matmul in the
        # weight dtype — f32 operands run the MXU at 1/4 rate
        x = x.astype(w0.dtype if hasattr(w0, "dtype") else jnp.bfloat16)
    out = dense(x, layers[0]["w"], layers[0]["b"])
    for lp in layers[1:]:
        out = dense(jax.nn.gelu(out, approximate=False), lp["w"], lp["b"])
    return out
