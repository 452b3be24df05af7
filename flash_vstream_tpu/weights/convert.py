"""HF checkpoint -> JAX param tree conversion.

Replaces the reference's load_pretrained_model / from_pretrained loading
(Flash-VStream-LLaVA/flash_vstream/model/builder.py:29-139,
Flash-VStream-Qwen/inference_mcq_vqa.py:144-174) with direct
state-dict-to-pytree mapping. Sources:
- a directory of .safetensors shards (load_safetensors_dir), or
- an in-memory {name: ndarray} state dict (testing / HF-torch parity).

Layer-stacked trees (models/llm.py et al.) are built by stacking per-layer
weights along axis 0. Linear weights transpose from torch [out, in] to
JAX [in, out]; conv patch embeddings flatten to a single matmul kernel.
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from ..core.config import LLMConfig, VitConfig


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load every *.safetensors shard in a directory into one state dict."""
    from safetensors.numpy import load_file
    sd: Dict[str, np.ndarray] = {}
    for name in sorted(os.listdir(path)):
        if name.endswith(".safetensors"):
            sd.update(load_file(os.path.join(path, name)))
    if not sd:
        raise FileNotFoundError(f"no .safetensors shards under {path}")
    return sd


def _t(x) -> np.ndarray:
    return np.asarray(x).T


def detect_prefix(sd: Dict[str, np.ndarray], probe: str, candidates) -> str:
    """Checkpoint layouts differ across transformers versions (e.g. 'visual.'
    vs 'model.visual.', 'model.' vs 'model.language_model.'); pick the prefix
    whose probe key exists."""
    for c in candidates:
        if c + probe in sd:
            return c
    raise KeyError(f"none of {candidates} + {probe} found in state dict")


def _stack(sd, fmt, n, transform):
    return jnp.asarray(np.stack([transform(sd[fmt.format(i=i)])
                                 for i in range(n)]))


def _lin(sd, fmt, n, bias: bool):
    p = {"w": _stack(sd, fmt + ".weight", n, _t)}
    if bias:
        p["b"] = _stack(sd, fmt + ".bias", n, np.asarray)
    return p


def convert_llama(sd: Dict[str, np.ndarray], cfg: LLMConfig,
                  prefix: Optional[str] = None, dtype=jnp.float32) -> dict:
    """LlamaForCausalLM / Qwen2 decoder state dict -> models/llm.py tree.

    Covers Vicuna-7B (no biases) and Qwen2-VL's language model
    (attention_bias=True)."""
    if prefix is None:
        prefix = detect_prefix(sd, "embed_tokens.weight",
                               ("model.", "model.language_model.",
                                "language_model.", ""))
    L = cfg.num_layers
    lay = prefix + "layers.{i}."
    params = {
        "embed": jnp.asarray(sd[prefix + "embed_tokens.weight"]),
        "layers": {
            "attn_norm": _stack(sd, lay + "input_layernorm.weight", L, np.asarray),
            "mlp_norm": _stack(sd, lay + "post_attention_layernorm.weight", L,
                               np.asarray),
            "attn": {
                "wq": _lin(sd, lay + "self_attn.q_proj", L, cfg.attention_bias),
                "wk": _lin(sd, lay + "self_attn.k_proj", L, cfg.attention_bias),
                "wv": _lin(sd, lay + "self_attn.v_proj", L, cfg.attention_bias),
                "wo": _lin(sd, lay + "self_attn.o_proj", L, False),
            },
            "mlp": {
                "gate": _lin(sd, lay + "mlp.gate_proj", L, False),
                "up": _lin(sd, lay + "mlp.up_proj", L, False),
                "down": _lin(sd, lay + "mlp.down_proj", L, False),
            },
        },
        "final_norm": jnp.asarray(sd[prefix + "norm.weight"]),
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(_t(sd["lm_head.weight"]))
    import jax
    return jax.tree.map(lambda x: x.astype(dtype), params)


def convert_clip_vit(sd: Dict[str, np.ndarray], cfg: VitConfig,
                     prefix: str = "vision_model.", dtype=jnp.float32) -> dict:
    """HF CLIPVisionModel state dict -> models/clip_vit.py tree."""
    L = cfg.num_layers
    lay = prefix + "encoder.layers.{i}."

    def ln(fmt):
        return {"scale": _stack(sd, fmt + ".weight", L, np.asarray),
                "bias": _stack(sd, fmt + ".bias", L, np.asarray)}

    patch_w = np.asarray(sd[prefix + "embeddings.patch_embedding.weight"])
    # conv [D, C, ps, ps] -> matmul [C*ps*ps, D]
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T

    # 'pre_layrnorm' is the (misspelled) HF attribute name
    pre_key = prefix + ("pre_layrnorm" if prefix + "pre_layrnorm.weight" in sd
                        else "pre_layernorm")
    params = {
        "patch_embed": {"w": jnp.asarray(patch_w)},
        "class_embed": jnp.asarray(
            sd[prefix + "embeddings.class_embedding"]).reshape(-1),
        "pos_embed": jnp.asarray(
            sd[prefix + "embeddings.position_embedding.weight"]),
        "pre_ln": {"scale": jnp.asarray(sd[pre_key + ".weight"]),
                   "bias": jnp.asarray(sd[pre_key + ".bias"])},
        "layers": {
            "ln1": ln(lay + "layer_norm1"),
            "ln2": ln(lay + "layer_norm2"),
            "attn": {
                "wq": _lin(sd, lay + "self_attn.q_proj", L, True),
                "wk": _lin(sd, lay + "self_attn.k_proj", L, True),
                "wv": _lin(sd, lay + "self_attn.v_proj", L, True),
                "wo": _lin(sd, lay + "self_attn.out_proj", L, True),
            },
            "mlp": {
                "fc1": _lin(sd, lay + "mlp.fc1", L, True),
                "fc2": _lin(sd, lay + "mlp.fc2", L, True),
            },
        },
    }
    import jax
    return jax.tree.map(lambda x: x.astype(dtype), params)


def convert_qwen_vit(sd: Dict[str, np.ndarray], cfg: VitConfig,
                     prefix: Optional[str] = None, dtype=jnp.float32) -> dict:
    """HF Qwen2-VL vision tower state dict -> models/qwen2_vit.py tree.

    The packed qkv Linear splits into separate q/k/v matrices."""
    if prefix is None:
        prefix = detect_prefix(sd, "patch_embed.proj.weight",
                               ("visual.", "model.visual.", ""))
    L = cfg.num_layers
    D = cfg.hidden_size
    lay = prefix + "blocks.{i}."

    def ln(fmt, stacked=True):
        if stacked:
            return {"scale": _stack(sd, fmt + ".weight", L, np.asarray),
                    "bias": _stack(sd, fmt + ".bias", L, np.asarray)}
        return {"scale": jnp.asarray(sd[fmt + ".weight"]),
                "bias": jnp.asarray(sd[fmt + ".bias"])}

    def qkv_split(which: int):
        def w(i):
            m = np.asarray(sd[lay.format(i=i) + "attn.qkv.weight"])
            return m[which * D:(which + 1) * D].T
        def b(i):
            v = np.asarray(sd[lay.format(i=i) + "attn.qkv.bias"])
            return v[which * D:(which + 1) * D]
        return {"w": jnp.asarray(np.stack([w(i) for i in range(L)])),
                "b": jnp.asarray(np.stack([b(i) for i in range(L)]))}

    patch_w = np.asarray(sd[prefix + "patch_embed.proj.weight"])
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T   # [C*tp*ps*ps, D]

    params = {
        "patch_embed": {"w": jnp.asarray(patch_w)},
        "layers": {
            "ln1": ln(lay + "norm1"),
            "ln2": ln(lay + "norm2"),
            "attn": {
                "wq": qkv_split(0), "wk": qkv_split(1), "wv": qkv_split(2),
                "wo": _lin(sd, lay + "attn.proj", L, True),
            },
            "mlp": {
                "fc1": _lin(sd, lay + "mlp.fc1", L, True),
                "fc2": _lin(sd, lay + "mlp.fc2", L, True),
            },
        },
        "merger": {
            "ln_q": ln(prefix + "merger.ln_q", stacked=False),
            "fc1": {"w": jnp.asarray(_t(sd[prefix + "merger.mlp.0.weight"])),
                    "b": jnp.asarray(sd[prefix + "merger.mlp.0.bias"])},
            "fc2": {"w": jnp.asarray(_t(sd[prefix + "merger.mlp.2.weight"])),
                    "b": jnp.asarray(sd[prefix + "merger.mlp.2.bias"])},
        },
    }
    import jax
    return jax.tree.map(lambda x: x.astype(dtype), params)


def convert_ntm(sd: Dict[str, np.ndarray], prefix: str = "model.attention_model.",
                dtype=jnp.float32):
    """NeuralTuringMachine weights (vstream_arch.py:34-45) -> NTMParams."""
    from ..ops.ntm import NTMParams
    g = lambda k: jnp.asarray(sd[prefix + k]).astype(dtype)
    return NTMParams(
        wq=_t(g("q_proj.weight")), bq=g("q_proj.bias"),
        wk=_t(g("k_proj.weight")), bk=g("k_proj.bias"),
        wv=_t(g("v_proj.weight")), bv=g("v_proj.bias"),
        wo=_t(g("out_proj.weight")), bo=g("out_proj.bias"),
        ln_scale=g("out_ln.weight"), ln_bias=g("out_ln.bias"))


def convert_projector(sd: Dict[str, np.ndarray],
                      prefix: str = "model.mm_projector.",
                      dtype=jnp.float32) -> dict:
    """mm_projector Sequential (Linear[,GELU,Linear...]) -> projector tree."""
    layers = []
    i = 0
    while f"{prefix}{i}.weight" in sd or (i == 0 and f"{prefix}weight" in sd):
        if i == 0 and f"{prefix}weight" in sd:   # bare Linear
            layers.append({"w": jnp.asarray(_t(sd[prefix + "weight"])).astype(dtype),
                           "b": jnp.asarray(sd[prefix + "bias"]).astype(dtype)})
            break
        layers.append({"w": jnp.asarray(_t(sd[f"{prefix}{i}.weight"])).astype(dtype),
                       "b": jnp.asarray(sd[f"{prefix}{i}.bias"]).astype(dtype)})
        i += 2   # skip GELU modules
    if not layers:
        raise KeyError(f"no projector weights under {prefix}")
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Adapter / LoRA / token-surgery loading (reference model/builder.py:48-98,
# vstream_arch.py:700-743)
# ---------------------------------------------------------------------------

def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-serialized state dict (.bin) to numpy (CPU torch)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def _strip_peft_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """base_model.model.model.* / model.model.* -> model.* (builder.py:76-78)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("base_model."):
            k = k[len("base_model."):]
        if k.startswith("model.model."):
            k = k[len("model."):]
        out[k] = v
    return out


def resize_token_embeddings(llm_params: dict, new_size: int) -> dict:
    """Grow embed/lm_head rows to new_size; new rows take the mean of the
    existing ones (initialize_vision_tokenizer, vstream_arch.py:711-723).
    Checkpoints that extended the tokenizer (im_start/end, image patch
    token) need this before their embed rows load."""
    import jax
    embed = llm_params["embed"]
    n_old = embed.shape[0]
    if new_size <= n_old:
        return llm_params
    out = dict(llm_params)
    mean_in = jnp.mean(embed, axis=0, keepdims=True)
    out["embed"] = jnp.concatenate(
        [embed, jnp.broadcast_to(mean_in, (new_size - n_old, embed.shape[1]))
         .astype(embed.dtype)])
    if "lm_head" in llm_params:       # [D, V]
        head = llm_params["lm_head"]
        mean_out = jnp.mean(head, axis=1, keepdims=True)
        out["lm_head"] = jnp.concatenate(
            [head, jnp.broadcast_to(mean_out,
                                    (head.shape[0], new_size - n_old))
             .astype(head.dtype)], axis=1)
    return out


_LORA_PROJ = {"q_proj": ("attn", "wq"), "k_proj": ("attn", "wk"),
              "v_proj": ("attn", "wv"), "o_proj": ("attn", "wo"),
              "gate_proj": ("mlp", "gate"), "up_proj": ("mlp", "up"),
              "down_proj": ("mlp", "down")}


def apply_lora_adapter(llm_params: dict, adapter_sd: Dict[str, np.ndarray],
                       alpha: float, rank: int) -> dict:
    """Merge torch-PEFT LoRA deltas into the stacked decoder tree:
    W[in,out] += (alpha/r) * (B @ A)^T (merge_and_unload semantics,
    builder.py:81-86). Adapter keys look like
    base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight."""
    import jax
    scale = alpha / rank
    deltas: Dict[tuple, dict] = {}
    pat = re.compile(r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\."
                     r"lora_(A|B)\.weight$")
    for k, v in adapter_sd.items():
        m = pat.search(k)
        if m:
            i, proj, ab = int(m.group(1)), m.group(2), m.group(3)
            deltas.setdefault((i, proj), {})[ab] = np.asarray(v)

    params = jax.tree.map(lambda x: x, llm_params)   # shallow-copy tree
    layers = {k: dict(v) if isinstance(v, dict) else v
              for k, v in params["layers"].items()}
    stacked = {}
    for (i, proj), ab in deltas.items():
        assert "A" in ab and "B" in ab, f"incomplete LoRA pair for {proj}@{i}"
        grp, name = _LORA_PROJ[proj]
        stacked.setdefault((grp, name), {})[i] = (
            scale * (ab["B"] @ ab["A"]).T)     # torch [out,in] -> jax [in,out]
    for (grp, name), per_layer in stacked.items():
        w = np.asarray(layers[grp][name]["w"], np.float32).copy()
        for i, d in per_layer.items():
            w[i] += d
        new = dict(layers[grp][name])
        new["w"] = jnp.asarray(w).astype(llm_params["layers"][grp][name]["w"].dtype)
        layers[grp] = dict(layers[grp])
        layers[grp][name] = new
    params["layers"] = layers
    return params


def load_pretrained_model(model_path: str, cfg, model_base: Optional[str] = None,
                          model_name: Optional[str] = None,
                          tokenizer_len: Optional[int] = None,
                          dtype=jnp.float32) -> dict:
    """LLaVA-family checkpoint loading with the reference's three branches
    (model/builder.py:48-98):

    - LoRA ('lora' in model_name, model_base given): base weights ->
      resize token embeddings -> non_lora_trainables.bin overlay
      (projector/NTM/embed rows) -> merge adapter_model deltas.
    - projector-only (model_base given): base weights + mm_projector.bin
      overlay (pretrain stage-1 artifact).
    - full: everything from model_path.
    """
    name = (model_name or os.path.basename(model_path.rstrip("/"))).lower()
    if model_base is None:
        params = load_llava_checkpoint(model_path, cfg, dtype=dtype)
        if tokenizer_len:
            params["llm"] = resize_token_embeddings(params["llm"],
                                                    tokenizer_len)
        return params

    params = load_llava_checkpoint(model_base, cfg, dtype=dtype)
    if tokenizer_len:
        params["llm"] = resize_token_embeddings(params["llm"], tokenizer_len)

    def overlay(sd):
        sd = _strip_peft_prefixes(sd)
        if any(k.startswith("model.mm_projector.") for k in sd):
            params["projector"] = convert_projector(sd, dtype=dtype)
        if any(k.startswith("model.attention_model.") for k in sd):
            params["ntm"] = convert_ntm(sd, dtype=dtype)
        if "model.embed_tokens.weight" in sd:
            rows = jnp.asarray(sd["model.embed_tokens.weight"]).astype(dtype)
            embed = params["llm"]["embed"]
            params["llm"]["embed"] = jnp.concatenate(
                [rows, embed[rows.shape[0]:]]) if rows.shape[0] < embed.shape[0] else rows
        if "lm_head.weight" in sd:
            params["llm"]["lm_head"] = jnp.asarray(
                _t(sd["lm_head.weight"])).astype(dtype)

    if "lora" in name:
        nlt = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(nlt):
            overlay(load_torch_bin(nlt))
        adapter_st = os.path.join(model_path, "adapter_model.safetensors")
        adapter_bin = os.path.join(model_path, "adapter_model.bin")
        if os.path.exists(adapter_st):
            from safetensors.numpy import load_file
            adapter = load_file(adapter_st)
        elif os.path.exists(adapter_bin):
            adapter = load_torch_bin(adapter_bin)
        else:
            raise FileNotFoundError(f"no adapter_model under {model_path}")
        acfg = {}
        acfg_path = os.path.join(model_path, "adapter_config.json")
        if os.path.exists(acfg_path):
            import json
            acfg = json.load(open(acfg_path))
        params["llm"] = apply_lora_adapter(
            params["llm"], adapter,
            alpha=acfg.get("lora_alpha", 16), rank=acfg.get("r", 16))
    else:
        proj = os.path.join(model_path, "mm_projector.bin")
        if os.path.exists(proj):
            overlay(load_torch_bin(proj))
        else:
            raise FileNotFoundError(
                f"{proj} not found (projector-only load, builder.py:88-95)")
    return params


# ---------------------------------------------------------------------------
# Full-model loaders
# ---------------------------------------------------------------------------

def load_llava_checkpoint(model_dir: str, cfg, dtype=jnp.float32) -> dict:
    """Load a Flash-VStream-LLaVA HF checkpoint directory."""
    sd = load_safetensors_dir(model_dir)
    # reference layout nests CLIPVisionModel twice:
    # model.vision_tower.vision_tower.vision_model.* (clip_encoder.py:28-31)
    vit_sd = {k.rsplit("vision_tower.", 1)[1]: v for k, v in sd.items()
              if "vision_tower." in k}
    if not vit_sd:
        raise FileNotFoundError(
            "no vision tower weights in checkpoint; load the CLIP tower "
            "separately and pass via vit_dir")
    return {
        "vit": convert_clip_vit(vit_sd, cfg.vit, dtype=dtype),
        "projector": convert_projector(sd, dtype=dtype),
        "ntm": convert_ntm(sd, dtype=dtype),
        "llm": convert_llama(sd, cfg.llm, dtype=dtype),
    }


def load_qwen_checkpoint(model_dir: str, cfg, dtype=jnp.float32) -> dict:
    """Load a Flash-VStream-Qwen (or base Qwen2-VL) HF checkpoint directory."""
    sd = load_safetensors_dir(model_dir)
    return {
        "vit": convert_qwen_vit(sd, cfg.vit, dtype=dtype),
        "llm": convert_llama(sd, cfg.llm, dtype=dtype),
    }


def qwen_config_from_hf(model_dir_or_dict) -> "VStreamQwenConfig":
    """Build a VStreamQwenConfig from an HF checkpoint's config.json
    (directory path or already-parsed dict), so any released size (2B/7B/
    custom) converts without hand-written configs. Mirrors the field layout
    of FlashVStreamQwen2VLConfig (vstream_qwen2vl_model.py:430-462)."""
    import json

    from ..core.config import FlashMemoryConfig, VStreamQwenConfig
    if isinstance(model_dir_or_dict, dict):
        d = model_dir_or_dict
    else:
        with open(os.path.join(model_dir_or_dict, "config.json")) as f:
            d = json.load(f)
    # newer HF nests the text fields under text_config
    t = d.get("text_config", d)
    v = d["vision_config"]
    embed_dim = v.get("embed_dim", v.get("hidden_size", 1280))
    vit = VitConfig(
        hidden_size=embed_dim,
        intermediate_size=int(embed_dim * v.get("mlp_ratio", 4)),
        num_layers=v.get("depth", 32),
        num_heads=v.get("num_heads", 16),
        patch_size=v.get("patch_size", 14),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        in_channels=v.get("in_channels", 3),
        use_rope_2d=True,
        merger_out_dim=t["hidden_size"],
        hidden_act="quick_gelu",
    )
    mrope = tuple((t.get("rope_scaling") or {}).get(
        "mrope_section", (16, 24, 24)))
    llm = LLMConfig(
        vocab_size=t["vocab_size"],
        hidden_size=t["hidden_size"],
        intermediate_size=t["intermediate_size"],
        num_layers=t["num_hidden_layers"],
        num_heads=t["num_attention_heads"],
        num_kv_heads=t.get("num_key_value_heads",
                           t["num_attention_heads"]),
        max_position_embeddings=t.get("max_position_embeddings", 32768),
        rms_norm_eps=t.get("rms_norm_eps", 1e-6),
        rope_theta=t.get("rope_theta", 1e6),
        attention_bias=True,
        tie_word_embeddings=d.get("tie_word_embeddings", False),
        mrope_sections=mrope,
    )
    fm = (FlashMemoryConfig.from_dict(v["flash_memory_config"])
          if v.get("flash_memory_config") else FlashMemoryConfig())
    return VStreamQwenConfig(
        vit=vit, llm=llm, flash_memory=fm,
        image_token_id=d.get("image_token_id", 151655),
        video_token_id=d.get("video_token_id", 151656),
        vision_start_token_id=d.get("vision_start_token_id", 151652),
    )
