"""JAX param trees -> HF-format state dicts (reverse of convert.py).

Lets trained checkpoints round-trip to the HF ecosystem (the reference's
save paths produce HF-format models, finetune_flash.py:600-617); convert.py
-> export.py is identity-tested.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import LLMConfig, VitConfig


def _t(x) -> np.ndarray:
    return np.asarray(x).T


def export_llama(params: dict, cfg: LLMConfig,
                 prefix: str = "model.") -> Dict[str, np.ndarray]:
    """models/llm.py tree -> HF Llama/Qwen2 state dict (numpy)."""
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "embed_tokens.weight"] = np.asarray(params["embed"])
    L = cfg.num_layers
    lay = params["layers"]
    for i in range(L):
        p = f"{prefix}layers.{i}."
        sd[p + "input_layernorm.weight"] = np.asarray(lay["attn_norm"][i])
        sd[p + "post_attention_layernorm.weight"] = np.asarray(
            lay["mlp_norm"][i])
        for name, key in (("q_proj", "wq"), ("k_proj", "wk"),
                          ("v_proj", "wv"), ("o_proj", "wo")):
            sd[p + f"self_attn.{name}.weight"] = _t(lay["attn"][key]["w"][i])
            if "b" in lay["attn"][key]:
                sd[p + f"self_attn.{name}.bias"] = np.asarray(
                    lay["attn"][key]["b"][i])
        for name, key in (("gate_proj", "gate"), ("up_proj", "up"),
                          ("down_proj", "down")):
            sd[p + f"mlp.{name}.weight"] = _t(lay["mlp"][key]["w"][i])
    sd[prefix + "norm.weight"] = np.asarray(params["final_norm"])
    if "lm_head" in params:
        sd["lm_head.weight"] = _t(params["lm_head"])
    return sd


def export_qwen_vit(params: dict, cfg: VitConfig,
                    prefix: str = "visual.") -> Dict[str, np.ndarray]:
    """models/qwen2_vit.py tree -> HF Qwen2-VL vision state dict."""
    sd: Dict[str, np.ndarray] = {}
    D = cfg.hidden_size
    pw = _t(params["patch_embed"]["w"])   # [D, C*tp*ps*ps]
    sd[prefix + "patch_embed.proj.weight"] = pw.reshape(
        D, cfg.in_channels, cfg.temporal_patch_size, cfg.patch_size,
        cfg.patch_size)
    lay = params["layers"]
    for i in range(cfg.num_layers):
        p = f"{prefix}blocks.{i}."
        for ln, key in (("norm1", "ln1"), ("norm2", "ln2")):
            sd[p + f"{ln}.weight"] = np.asarray(lay[key]["scale"][i])
            sd[p + f"{ln}.bias"] = np.asarray(lay[key]["bias"][i])
        qkv_w = np.concatenate([_t(lay["attn"][k]["w"][i])
                                for k in ("wq", "wk", "wv")], axis=0)
        qkv_b = np.concatenate([np.asarray(lay["attn"][k]["b"][i])
                                for k in ("wq", "wk", "wv")])
        sd[p + "attn.qkv.weight"] = qkv_w
        sd[p + "attn.qkv.bias"] = qkv_b
        sd[p + "attn.proj.weight"] = _t(lay["attn"]["wo"]["w"][i])
        sd[p + "attn.proj.bias"] = np.asarray(lay["attn"]["wo"]["b"][i])
        for fc in ("fc1", "fc2"):
            sd[p + f"mlp.{fc}.weight"] = _t(lay["mlp"][fc]["w"][i])
            sd[p + f"mlp.{fc}.bias"] = np.asarray(lay["mlp"][fc]["b"][i])
    m = params["merger"]
    sd[prefix + "merger.ln_q.weight"] = np.asarray(m["ln_q"]["scale"])
    sd[prefix + "merger.ln_q.bias"] = np.asarray(m["ln_q"]["bias"])
    sd[prefix + "merger.mlp.0.weight"] = _t(m["fc1"]["w"])
    sd[prefix + "merger.mlp.0.bias"] = np.asarray(m["fc1"]["b"])
    sd[prefix + "merger.mlp.2.weight"] = _t(m["fc2"]["w"])
    sd[prefix + "merger.mlp.2.bias"] = np.asarray(m["fc2"]["b"])
    return sd


def save_hf_checkpoint(path: str, sd: Dict[str, np.ndarray]):
    """Write one model.safetensors shard the loaders can read back."""
    import os
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
