"""CLIP ViT-L/14 vision tower (LLaVA generation).

Replaces the reference's frozen HF CLIPVisionModel
(Flash-VStream-LLaVA/flash_vstream/model/multimodal_encoder/clip_encoder.py):
selects the hidden states of layer `select_layer` (default -2) and drops the
CLS token ('patch' feature select, clip_encoder.py:31-39).

TPU-first: patch embedding as reshape+matmul (the 14x14/stride-14 conv is a
linear map over non-overlapping patches — one MXU matmul), frames batched
([B*T, 577, D]) through a scanned block stack, fused attention.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import VitConfig
from .layers import dense, gelu_mlp, init_dense, layer_norm, mha


def init_clip_params(key: jax.Array, cfg: VitConfig, dtype=jnp.float32) -> dict:
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    P = cfg.patches_per_side ** 2
    pd = cfg.in_channels * cfg.patch_size ** 2
    keys = jax.random.split(key, 8)

    def stack_init(k, din, dout):
        ks = jax.random.split(k, L)
        ps = [init_dense(ki, din, dout, bias=True, dtype=dtype) for ki in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    def ln(shape=(L, D)):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "patch_embed": {"w": jax.random.normal(keys[0], (pd, D), dtype) * 0.02},
        "class_embed": jax.random.normal(keys[1], (D,), dtype) * 0.02,
        "pos_embed": jax.random.normal(keys[2], (P + 1, D), dtype) * 0.02,
        "pre_ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
        "layers": {
            "ln1": ln(), "ln2": ln(),
            "attn": {
                "wq": stack_init(keys[3], D, D),
                "wk": stack_init(keys[4], D, D),
                "wv": stack_init(keys[5], D, D),
                "wo": stack_init(keys[6], D, D),
            },
            "mlp": {
                "fc1": stack_init(keys[7], D, I),
                "fc2": stack_init(jax.random.fold_in(key, 9), I, D),
            },
        },
    }


def patchify_images(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[N, C, H, W] -> [N, (H/ps)*(W/ps), C*ps*ps], row-major patch order.

    Channel layout matches a conv kernel flattened as (C, ps, ps) so HF conv
    weights transfer directly.
    """
    N, C, H, W = images.shape
    ph, pw = H // patch_size, W // patch_size
    x = images.reshape(N, C, ph, patch_size, pw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)          # [N, ph, pw, C, ps, ps]
    return x.reshape(N, ph * pw, C * patch_size * patch_size)


def clip_encode(params: dict, cfg: VitConfig, images: jnp.ndarray) -> jnp.ndarray:
    """Encode images [N, C, H, W] -> patch features [N, P, D] from the
    select_layer hidden state, CLS dropped."""
    N = images.shape[0]
    D = cfg.hidden_size
    patches = patchify_images(images, cfg.patch_size)
    x = dense(patches, params["patch_embed"]["w"])            # [N, P, D]
    cls = jnp.broadcast_to(params["class_embed"].astype(x.dtype), (N, 1, D))
    x = jnp.concatenate([cls, x], axis=1)                     # [N, 1+P, D]
    x = x + params["pos_embed"].astype(x.dtype)[None]
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.layer_norm_eps)

    # run layers up to (and including) num_layers + select_layer + 1
    n_run = cfg.num_layers + cfg.select_layer + 1 if cfg.select_layer < 0 \
        else cfg.select_layer
    layers = jax.tree.map(lambda p: p[:n_run], params["layers"])

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"],
                       cfg.layer_norm_eps)
        attn, _ = mha(lp["attn"], h, num_heads=cfg.num_heads,
                      num_kv_heads=cfg.num_heads, head_dim=cfg.head_dim)
        x = x + attn
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"],
                       cfg.layer_norm_eps)
        x = x + gelu_mlp(lp["mlp"], h, cfg.hidden_act)
        return x, None

    x, _ = jax.lax.scan(body, x, layers)
    return x[:, 1:]                                            # drop CLS
