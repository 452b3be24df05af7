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


def export_clip_vit(params: dict, cfg: VitConfig,
                    prefix: str = "vision_model.") -> Dict[str, np.ndarray]:
    """models/clip_vit.py tree -> HF CLIPVisionModel state dict."""
    sd: Dict[str, np.ndarray] = {}
    D = cfg.hidden_size
    pw = _t(params["patch_embed"]["w"])   # [D, C*ps*ps]
    sd[prefix + "embeddings.patch_embedding.weight"] = pw.reshape(
        D, cfg.in_channels, cfg.patch_size, cfg.patch_size)
    sd[prefix + "embeddings.class_embedding"] = np.asarray(
        params["class_embed"])
    sd[prefix + "embeddings.position_embedding.weight"] = np.asarray(
        params["pos_embed"])
    sd[prefix + "pre_layrnorm.weight"] = np.asarray(params["pre_ln"]["scale"])
    sd[prefix + "pre_layrnorm.bias"] = np.asarray(params["pre_ln"]["bias"])
    lay = params["layers"]
    for i in range(cfg.num_layers):
        p = f"{prefix}encoder.layers.{i}."
        for ln, key in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            sd[p + f"{ln}.weight"] = np.asarray(lay[key]["scale"][i])
            sd[p + f"{ln}.bias"] = np.asarray(lay[key]["bias"][i])
        for name, key in (("q_proj", "wq"), ("k_proj", "wk"),
                          ("v_proj", "wv"), ("out_proj", "wo")):
            sd[p + f"self_attn.{name}.weight"] = _t(lay["attn"][key]["w"][i])
            sd[p + f"self_attn.{name}.bias"] = np.asarray(
                lay["attn"][key]["b"][i])
        for fc in ("fc1", "fc2"):
            sd[p + f"mlp.{fc}.weight"] = _t(lay["mlp"][fc]["w"][i])
            sd[p + f"mlp.{fc}.bias"] = np.asarray(lay["mlp"][fc]["b"][i])
    return sd


def export_projector(params: dict, prefix: str = "model.mm_projector."
                     ) -> Dict[str, np.ndarray]:
    """projector tree -> mm_projector Sequential state dict."""
    sd: Dict[str, np.ndarray] = {}
    layers = params["layers"]
    if len(layers) == 1:
        sd[prefix + "weight"] = _t(layers[0]["w"])
        sd[prefix + "bias"] = np.asarray(layers[0]["b"])
    else:
        for j, l in enumerate(layers):
            sd[f"{prefix}{2 * j}.weight"] = _t(l["w"])
            sd[f"{prefix}{2 * j}.bias"] = np.asarray(l["b"])
    return sd


def export_ntm(ntm, prefix: str = "model.attention_model."
               ) -> Dict[str, np.ndarray]:
    """NTMParams -> NeuralTuringMachine state dict (vstream_arch.py:34-45)."""
    return {
        prefix + "q_proj.weight": _t(ntm.wq), prefix + "q_proj.bias": np.asarray(ntm.bq),
        prefix + "k_proj.weight": _t(ntm.wk), prefix + "k_proj.bias": np.asarray(ntm.bk),
        prefix + "v_proj.weight": _t(ntm.wv), prefix + "v_proj.bias": np.asarray(ntm.bv),
        prefix + "out_proj.weight": _t(ntm.wo), prefix + "out_proj.bias": np.asarray(ntm.bo),
        prefix + "out_ln.weight": np.asarray(ntm.ln_scale),
        prefix + "out_ln.bias": np.asarray(ntm.ln_bias),
    }


def export_llava_checkpoint(params: dict, cfg) -> Dict[str, np.ndarray]:
    """Full Flash-VStream-LLaVA state dict (vit under
    model.vision_tower.vision_tower., reference checkpoint layout)."""
    sd = export_llama(params["llm"], cfg.llm)
    sd.update(export_clip_vit(
        params["vit"], cfg.vit,
        prefix="model.vision_tower.vision_tower.vision_model."))
    sd.update(export_projector(params["projector"]))
    sd.update(export_ntm(params["ntm"]))
    return sd


def save_hf_checkpoint(path: str, sd: Dict[str, np.ndarray]):
    """Write one model.safetensors shard the loaders can read back."""
    import os
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"))
