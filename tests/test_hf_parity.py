"""Numerical parity vs HuggingFace transformers (torch CPU reference).

SURVEY.md §7.2 step 2: convert random-init HF models' weights and compare
logits within tolerance. This is the guarantee that real checkpoints (Vicuna,
CLIP, Qwen2-VL) will produce matching outputs on TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flash_vstream_tpu.core.config import LLMConfig, VitConfig
from flash_vstream_tpu.models.clip_vit import clip_encode
from flash_vstream_tpu.models.llm import decoder_forward, embed_tokens, lm_head
from flash_vstream_tpu.models.qwen2_vit import (
    grid_positions,
    grid_segments,
    patch_merger,
    qwen_vit_blocks,
)
from flash_vstream_tpu.weights.convert import (
    convert_clip_vit,
    convert_llama,
    convert_qwen_vit,
)


def state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_clip_vit_parity(rng):
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, image_size=56, patch_size=14,
        num_channels=3)
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = VitConfig(hidden_size=32, intermediate_size=64, num_layers=4,
                    num_heads=4, patch_size=14, image_size=56,
                    select_layer=-2, hidden_act="quick_gelu")
    params = convert_clip_vit(state_dict_np(hf), cfg)

    imgs = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(imgs), output_hidden_states=True)
        want = out.hidden_states[-2][:, 1:].numpy()   # select_layer -2, no CLS

    got = np.asarray(clip_encode(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_llama_parity(rng):
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_layers=3, num_heads=4, num_kv_heads=2,
                    max_position_embeddings=64)
    params = convert_llama(state_dict_np(hf), cfg)

    ids = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()

    pos = jnp.broadcast_to(jnp.arange(12)[None], (2, 12))
    h, _ = decoder_forward(params, cfg, embed_tokens(params, jnp.asarray(ids)), pos)
    got = np.asarray(lm_head(params, cfg, h))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_qwen2_decoder_mrope_parity(rng):
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig
    hf_cfg = Qwen2VLConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        vision_config={"embed_dim": 32, "hidden_size": 32, "depth": 2,
                       "num_heads": 4, "in_channels": 3, "patch_size": 14,
                       "spatial_merge_size": 2, "temporal_patch_size": 2},
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval()

    cfg = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, num_kv_heads=2,
                    rms_norm_eps=1e-6, rope_theta=10000.0,
                    attention_bias=True, mrope_sections=(2, 1, 1))
    sd = state_dict_np(hf)
    # HF >=4.52 nests the text model under model.language_model.
    prefix = ("model.language_model."
              if any(k.startswith("model.language_model.") for k in sd)
              else "model.")
    params = convert_llama(sd, cfg, prefix=prefix)

    ids = rng.integers(0, 128, size=(1, 10))
    pos3 = np.stack([np.arange(10), np.arange(10) // 2, np.arange(10) % 3])
    with torch.no_grad():
        want = hf.model.language_model(
            input_ids=torch.from_numpy(ids),
            position_ids=torch.from_numpy(pos3[:, None, :]),
        ).last_hidden_state
        want = hf.lm_head(want).float().numpy()

    h, _ = decoder_forward(params, cfg, embed_tokens(params, jnp.asarray(ids)),
                           jnp.asarray(pos3)[:, None, :])
    got = np.asarray(lm_head(params, cfg, h))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_qwen2_vit_parity(rng):
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig
    hf_cfg = Qwen2VLConfig(
        vocab_size=128, hidden_size=24, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        vision_config={"embed_dim": 32, "hidden_size": 24, "depth": 3,
                       "num_heads": 4, "in_channels": 3, "patch_size": 14,
                       "spatial_merge_size": 2, "temporal_patch_size": 2,
                       "mlp_ratio": 2},
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval()
    visual = hf.model.visual if hasattr(hf.model, "visual") else hf.visual

    cfg = VitConfig(hidden_size=32, intermediate_size=64, num_layers=3,
                    num_heads=4, patch_size=14, temporal_patch_size=2,
                    spatial_merge_size=2, use_rope_2d=True, merger_out_dim=24,
                    hidden_act="quick_gelu")
    params = convert_qwen_vit(state_dict_np(hf), cfg)

    grid = (2, 4, 4)
    S = 2 * 4 * 4
    patches = rng.normal(size=(S, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        want = visual(torch.from_numpy(patches),
                      grid_thw=torch.tensor([grid])).numpy()

    pos = jnp.asarray(grid_positions([grid]))
    seg = jnp.asarray(grid_segments([grid]))
    hidden = qwen_vit_blocks(params, cfg, jnp.asarray(patches), pos, seg)
    got = np.asarray(patch_merger(params, hidden))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
