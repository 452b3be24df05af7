"""Production-DEPTH numerical parity vs HuggingFace (torch CPU, f32).

VERDICT r3 weak #3: toy-shape parity (4 layers, 32 dim) leaves accumulated
error over the real stacks uncharacterized. These tests run the REAL
architectures — Qwen2-VL's 32-layer/1280-wide ViT, the Qwen2-VL-2B
28-layer/1536-wide decoder (real released width, tied embeddings), and a
Vicuna-7B-shape 32-layer/4096-wide decoder — at f32 on CPU, assert logit
parity, and CHARACTERIZE the bf16 delta (reported + argmax-agreement
asserted, since bf16 is the production dtype).

Slow (minutes + tens of GB RAM): gated behind RUN_SLOW=1. Measured numbers
are recorded in PARITY.md §full-depth.

Reference parity target: BASELINE.md north star — "logits match PyTorch
within tolerance" at production depth.
"""
import gc
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from flash_vstream_tpu.core.config import LLMConfig, VitConfig
from flash_vstream_tpu.models.llm import decoder_forward, embed_tokens, lm_head
from flash_vstream_tpu.models.qwen2_vit import (
    grid_positions,
    grid_segments,
    patch_merger,
    qwen_vit_blocks,
)
from flash_vstream_tpu.weights.convert import convert_llama, convert_qwen_vit

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="full-depth parity needs RUN_SLOW=1 (minutes + tens of GB RAM)")


def state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _report(name, got, want):
    d = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-6)
    print(f"[{name}] max|Δ|={d.max():.3e} mean|Δ|={d.mean():.3e} "
          f"max rel={np.max(d / denom):.3e} "
          f"out range [{want.min():.2f}, {want.max():.2f}]",
          file=sys.stderr)
    return d.max()


def test_qwen2_vit_fulldepth_parity(rng):
    """Real Qwen2-VL vision tower: 32 layers, 1280 wide, 16 heads, mlp 5120,
    merger to 1536 (the 2B text width)."""
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig)
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel)
    hf_cfg = Qwen2VLVisionConfig(
        depth=32, embed_dim=1280, num_heads=16, mlp_ratio=4, in_channels=3,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        hidden_size=1536)
    torch.manual_seed(0)
    hf = Qwen2VisionTransformerPretrainedModel(hf_cfg).eval().float()

    cfg = VitConfig(hidden_size=1280, intermediate_size=5120, num_layers=32,
                    num_heads=16, patch_size=14, temporal_patch_size=2,
                    spatial_merge_size=2, use_rope_2d=True,
                    merger_out_dim=1536, hidden_act="quick_gelu")
    grid = (2, 16, 16)                      # 224px clip pair, 512 patch rows
    S = grid[0] * grid[1] * grid[2]
    patches = (rng.normal(size=(S, 3 * 2 * 14 * 14)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(patches),
                  grid_thw=torch.tensor([grid])).float().numpy()
    params = convert_qwen_vit(state_dict_np(hf), cfg)
    del hf
    gc.collect()

    pos = jnp.asarray(grid_positions([grid]))
    seg = jnp.asarray(grid_segments([grid]))
    hidden = qwen_vit_blocks(params, cfg, jnp.asarray(patches), pos, seg)
    got = np.asarray(patch_merger(params, hidden))
    _report("qwen_vit32 f32", got, want)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # bf16 characterization: production dtype; report delta, pin cosine
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    hidden16 = qwen_vit_blocks(params16, cfg, jnp.asarray(patches,
                                                          jnp.bfloat16),
                               pos, seg)
    got16 = np.asarray(patch_merger(params16, hidden16)).astype(np.float32)
    _report("qwen_vit32 bf16", got16, want)
    cos = (got16 * want).sum() / (np.linalg.norm(got16)
                                  * np.linalg.norm(want))
    print(f"[qwen_vit32 bf16] cosine={cos:.6f}", file=sys.stderr)
    assert cos > 0.995


def _decoder_parity(hf, cfg, prefix, ids, t_pos, j_pos, name, rtol, atol):
    """t_pos: HF position_ids ([B,S] plain / [3,B,S] mrope); j_pos: ours."""
    with torch.no_grad():
        lm = hf.model.language_model if hasattr(
            hf.model, "language_model") else hf.model
        want = lm(input_ids=torch.from_numpy(ids),
                  position_ids=torch.from_numpy(t_pos)).last_hidden_state
        want = hf.lm_head(want).float().numpy()
    params = convert_llama(state_dict_np(hf), cfg, prefix=prefix)
    del hf
    gc.collect()

    jpos = jnp.asarray(j_pos)
    h, _ = decoder_forward(params, cfg, embed_tokens(params,
                                                     jnp.asarray(ids)), jpos)
    got = np.asarray(lm_head(params, cfg, h))
    _report(f"{name} f32", got, want)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)

    # bf16: production dtype — greedy decode must agree
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    h16, _ = decoder_forward(params16, cfg,
                             embed_tokens(params16, jnp.asarray(ids)), jpos)
    got16 = np.asarray(lm_head(params16, cfg, h16))
    _report(f"{name} bf16", got16, want)
    agree = (got16.argmax(-1) == want.argmax(-1)).mean()
    print(f"[{name} bf16] greedy argmax agreement={agree:.3f}",
          file=sys.stderr)
    assert agree >= 0.9


def test_qwen2vl_2b_decoder_fulldepth_parity(rng):
    """Qwen2-VL-2B released decoder shape: 28 layers, 1536 hidden, 8960 mlp,
    12 heads / 2 kv, tied embeddings, mrope [16, 24, 24], theta 1e6."""
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLConfig)
    hf_cfg = Qwen2VLConfig(
        vocab_size=8192,                    # embed rows don't accumulate
        hidden_size=1536, intermediate_size=8960, num_hidden_layers=28,
        num_attention_heads=12, num_key_value_heads=2,
        max_position_embeddings=32768, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [16, 24, 24]},
        vision_config={"embed_dim": 32, "hidden_size": 32, "depth": 1,
                       "num_heads": 4, "in_channels": 3, "patch_size": 14,
                       "spatial_merge_size": 2, "temporal_patch_size": 2},
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    sd = hf.state_dict()
    prefix = ("model.language_model."
              if any(k.startswith("model.language_model.") for k in sd)
              else "model.")

    cfg = LLMConfig(vocab_size=8192, hidden_size=1536,
                    intermediate_size=8960, num_layers=28, num_heads=12,
                    num_kv_heads=2, rms_norm_eps=1e-6, rope_theta=1e6,
                    attention_bias=True, mrope_sections=(16, 24, 24))
    ids = rng.integers(0, 8192, size=(1, 16))
    pos3 = np.stack([np.arange(16), np.arange(16) // 2, np.arange(16) % 4])
    _decoder_parity(hf, cfg, prefix, ids, pos3[:, None, :], pos3[:, None, :],
                    "qwen2vl_2b", rtol=2e-2, atol=2e-2)


def test_llama_7b_depth_parity(rng):
    """Vicuna-7B depth/width: 32 layers, 4096 hidden, 11008 mlp, 32 heads.
    Vocab reduced to 4096 (embedding rows are a lookup — they don't change
    how error accumulates through the layer stack)."""
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=4096, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval().float()

    cfg = LLMConfig(vocab_size=4096, hidden_size=4096,
                    intermediate_size=11008, num_layers=32, num_heads=32,
                    num_kv_heads=32, max_position_embeddings=4096)
    ids = rng.integers(0, 4096, size=(1, 8))
    pos = np.broadcast_to(np.arange(8)[None], (1, 8)).copy()
    _decoder_parity(hf, cfg, "model.", ids, pos, pos, "llama_7b_depth",
                    rtol=2e-2, atol=2e-2)
