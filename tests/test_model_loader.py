"""Checkpoint-loader parity: full / projector-only / LoRA-adapter branches
and token-embedding resize, roundtripped through exported synthetic
checkpoints (reference model/builder.py:48-98, vstream_arch.py:700-743)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_vstream_tpu.core.config import tiny_llava_config
from flash_vstream_tpu.models.vstream_llava import init_llava_params
from flash_vstream_tpu.weights.convert import (
    apply_lora_adapter,
    load_llava_checkpoint,
    load_pretrained_model,
    resize_token_embeddings,
)
from flash_vstream_tpu.weights.export import (
    export_llava_checkpoint,
    save_hf_checkpoint,
)

CFG = tiny_llava_config()


def tree_close(a, b, rtol=1e-5):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, x in fa:
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(fb[path], np.float32),
                                   rtol=rtol, atol=1e-6, err_msg=str(path))


@pytest.fixture(scope="module")
def base_ckpt(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("base"))
    params = init_llava_params(jax.random.PRNGKey(0), CFG)
    save_hf_checkpoint(base, export_llava_checkpoint(params, CFG))
    return base, params


def test_full_load_roundtrip(base_ckpt):
    base, params = base_ckpt
    loaded = load_pretrained_model(base, CFG)
    tree_close(params, loaded)
    # load_llava_checkpoint is the same path
    tree_close(params, load_llava_checkpoint(base, CFG))


def test_projector_only_load(base_ckpt, tmp_path):
    """Stage-1 artifact: mm_projector.bin (+NTM) over a base model
    (builder.py:88-95, reference save path train.py:199-221)."""
    import torch
    base, params = base_ckpt
    stage1 = str(tmp_path / "vstream-pretrain")
    os.makedirs(stage1)
    rng = np.random.default_rng(1)
    proj_sd = {}
    for j, l in enumerate(params["projector"]["layers"]):
        w = rng.normal(size=np.asarray(l["w"]).T.shape).astype(np.float32)
        b = rng.normal(size=np.asarray(l["b"]).shape).astype(np.float32)
        proj_sd[f"model.mm_projector.{2 * j}.weight"] = torch.tensor(w)
        proj_sd[f"model.mm_projector.{2 * j}.bias"] = torch.tensor(b)
    torch.save(proj_sd, os.path.join(stage1, "mm_projector.bin"))

    loaded = load_pretrained_model(stage1, CFG, model_base=base)
    # projector overlaid, rest identical to base
    w0 = np.asarray(loaded["projector"]["layers"][0]["w"])
    np.testing.assert_allclose(
        w0, proj_sd["model.mm_projector.0.weight"].numpy().T, rtol=1e-6)
    tree_close(params["llm"], loaded["llm"])
    tree_close(params["vit"], loaded["vit"])


def test_lora_adapter_load(base_ckpt, tmp_path):
    """LoRA branch: non_lora_trainables overlay + merged adapter deltas
    (builder.py:52-86)."""
    import torch
    from safetensors.numpy import save_file
    base, params = base_ckpt
    lora_dir = str(tmp_path / "vstream-7b-lora")
    os.makedirs(lora_dir)
    rank, alpha = 2, 8
    D = CFG.llm.hidden_size
    Hd = CFG.llm.num_heads * CFG.llm.head_dim
    rng = np.random.default_rng(2)
    A = rng.normal(size=(rank, D)).astype(np.float32)   # torch [r, in]
    B = rng.normal(size=(Hd, rank)).astype(np.float32)  # torch [out, r]
    save_file({
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
    }, os.path.join(lora_dir, "adapter_model.safetensors"))
    json.dump({"r": rank, "lora_alpha": alpha},
              open(os.path.join(lora_dir, "adapter_config.json"), "w"))
    ntm_w = rng.normal(size=np.asarray(params["ntm"].wq).T.shape
                       ).astype(np.float32)
    nlt = {"base_model.model.model.attention_model.q_proj.weight":
           torch.tensor(ntm_w)}
    for k in ("k_proj", "v_proj", "out_proj"):
        w = getattr(params["ntm"], {"k_proj": "wk", "v_proj": "wv",
                                    "out_proj": "wo"}[k])
        nlt[f"base_model.model.model.attention_model.{k}.weight"] = (
            torch.tensor(np.asarray(w).T))
    for k, v in (("q_proj", params["ntm"].bq), ("k_proj", params["ntm"].bk),
                 ("v_proj", params["ntm"].bv), ("out_proj", params["ntm"].bo)):
        nlt[f"base_model.model.model.attention_model.{k}.bias"] = (
            torch.tensor(np.asarray(v)))
    nlt["base_model.model.model.attention_model.out_ln.weight"] = (
        torch.tensor(np.asarray(params["ntm"].ln_scale)))
    nlt["base_model.model.model.attention_model.out_ln.bias"] = (
        torch.tensor(np.asarray(params["ntm"].ln_bias)))
    torch.save(nlt, os.path.join(lora_dir, "non_lora_trainables.bin"))

    loaded = load_pretrained_model(lora_dir, CFG, model_base=base)
    # layer-0 wq merged with (alpha/r) * (B@A)^T, layer 1 untouched
    expect = np.asarray(params["llm"]["layers"]["attn"]["wq"]["w"][0]) + \
        (alpha / rank) * (B @ A).T
    np.testing.assert_allclose(
        np.asarray(loaded["llm"]["layers"]["attn"]["wq"]["w"][0]), expect,
        rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(loaded["llm"]["layers"]["attn"]["wq"]["w"][1]),
        np.asarray(params["llm"]["layers"]["attn"]["wq"]["w"][1]), rtol=1e-6)
    # NTM overlaid from non_lora_trainables
    np.testing.assert_allclose(np.asarray(loaded["ntm"].wq), ntm_w.T,
                               rtol=1e-6)


def test_resize_token_embeddings():
    """Added tokens get mean-initialized embed/lm_head rows
    (initialize_vision_tokenizer, vstream_arch.py:711-723)."""
    params = init_llava_params(jax.random.PRNGKey(0), CFG)
    llm = params["llm"]
    V = llm["embed"].shape[0]
    grown = resize_token_embeddings(llm, V + 3)
    assert grown["embed"].shape[0] == V + 3
    np.testing.assert_allclose(np.asarray(grown["embed"][V:]),
                               np.broadcast_to(
                                   np.asarray(llm["embed"]).mean(0), (3, llm["embed"].shape[1])),
                               rtol=1e-4, atol=1e-6)
    assert grown["lm_head"].shape[1] == V + 3
    np.testing.assert_allclose(
        np.asarray(grown["lm_head"][:, V:]),
        np.broadcast_to(np.asarray(llm["lm_head"]).mean(1)[:, None],
                        (llm["lm_head"].shape[0], 3)), rtol=1e-4, atol=1e-6)
    # no-op when already large enough
    assert resize_token_embeddings(llm, V) is llm or \
        resize_token_embeddings(llm, V)["embed"].shape[0] == V


def test_apply_lora_adapter_noop_without_pairs(base_ckpt):
    base, params = base_ckpt
    merged = apply_lora_adapter(params["llm"], {}, alpha=8, rank=2)
    tree_close(params["llm"], merged)
