"""Mesh + sharding rules.

Replaces the reference's DeepSpeed/NCCL training distribution
(scripts/zero*.json, deepspeed/*_config.json) TPU-natively:
- DP over a 'dp' mesh axis (batch sharding),
- optional TP over a 'tp' axis (weight sharding; the reference has none —
  SURVEY.md §2.4 — but 7B decode latency on v5e-8 wants it),
- ZeRO-equivalent optimizer-state sharding over 'dp' (stage-1/2 semantics:
  params replicated, Adam moments sharded; XLA inserts the gathers).

Rules are regex-on-path -> PartitionSpec, applied to the stacked param trees
from models/*.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(dp: Optional[int] = None, tp: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, f"dp({dp}) * tp({tp}) > devices({n})"
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def create_train_mesh(dp: Optional[int] = None, pp: int = 1, sp: int = 1,
                      devices: Optional[Sequence] = None) -> Mesh:
    """dp x (pp | sp) training mesh. pp/sp lay out CONTIGUOUS device ranges
    (minor-most axis) so the stage/ring `ppermute`s are nearest-neighbor
    hops on the ICI torus; dp is the outer axis (gradient psum)."""
    assert not (pp > 1 and sp > 1), "pick one of pp/sp per run"
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    inner = max(pp, sp)
    name = "pp" if pp > 1 else "sp" if sp > 1 else "tp"
    if dp is None:
        dp = n // inner
    assert dp * inner <= n, f"dp({dp}) x {name}({inner}) > devices({n})"
    arr = np.asarray(devices[:dp * inner]).reshape(dp, inner)
    return Mesh(arr, ("dp", name))


# (regex on '/'-joined path, spec builder given array ndim)
# Specs name only the dims that are sharded; all others replicate.
def _spec(*axes: Optional[str]) -> P:
    return P(*axes)


LLM_RULES: Sequence[Tuple[str, P]] = (
    # stacked layer weights: [L, din, dout]
    (r"layers/attn/w[qkv]/w$", _spec(None, None, "tp")),
    (r"layers/attn/w[qkv]/b$", _spec(None, "tp")),
    (r"layers/attn/wo/w$", _spec(None, "tp", None)),
    (r"layers/mlp/(gate|up)/w$", _spec(None, None, "tp")),
    (r"layers/mlp/down/w$", _spec(None, "tp", None)),
    (r"^embed$", _spec("tp", None)),
    (r"^lm_head$", _spec(None, "tp")),
    # vit (same block structure under vit/)
    (r"vit/layers/attn/w[qkv]/w$", _spec(None, None, "tp")),
    (r"vit/layers/attn/w[qkv]/b$", _spec(None, "tp")),
    (r"vit/layers/attn/wo/w$", _spec(None, "tp", None)),
    (r"vit/layers/mlp/fc1/w$", _spec(None, None, "tp")),
    (r"vit/layers/mlp/fc1/b$", _spec(None, "tp")),
    (r"vit/layers/mlp/fc2/w$", _spec(None, "tp", None)),
)


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspec(path: str, ndim: int,
                rules: Sequence[Tuple[str, P]] = LLM_RULES) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            if len(spec) <= ndim:
                return spec
    return P()  # replicate


def _fit_mesh(spec: P, mesh: Mesh) -> P:
    """Drop spec axes the mesh doesn't have (e.g. 'tp' rules on a dp x pp
    training mesh): a missing axis means that dim replicates."""
    return P(*(a if a in mesh.axis_names else None for a in spec))


def param_shardings(mesh: Mesh, params,
                    rules: Sequence[Tuple[str, P]] = LLM_RULES):
    """NamedSharding tree matching the param tree."""
    def one(path, x):
        spec = param_pspec(path_str(path), x.ndim, rules)
        return NamedSharding(mesh, _fit_mesh(spec, mesh))
    return jax.tree_util.tree_map_with_path(one, params)


def zero_shardings(mesh: Mesh, params,
                   rules: Sequence[Tuple[str, P]] = LLM_RULES):
    """ZeRO-style shardings: like the param sharding, plus the largest free
    (unsharded, divisible) axis sharded over 'dp'.

    Used for optimizer moments at ZeRO stage 1/2, and for the parameters
    themselves at stage 3 (FSDP — reference scripts/zero3.json,
    Qwen deepspeed/zero3_config.json): each device holds 1/dp of every
    weight and XLA inserts the per-layer all-gather inside the layer scan
    (gather-on-use) plus reduce-scatter on the grads — the stage-3 schedule
    DeepSpeed implements by hand."""
    dp = mesh.shape["dp"]

    def one(path, x):
        spec = list(_fit_mesh(param_pspec(path_str(path), x.ndim, rules),
                              mesh))
        spec = spec + [None] * (x.ndim - len(spec))
        if dp > 1:
            # pick the largest dim not already sharded and divisible by dp
            free = [(d, x.shape[d]) for d in range(x.ndim)
                    if spec[d] is None and x.shape[d] % dp == 0 and x.shape[d] >= dp]
            if free:
                d = max(free, key=lambda t: t[1])[0]
                spec[d] = "dp"
        return NamedSharding(mesh, P(*spec))
    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
