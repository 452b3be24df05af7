"""export -> convert roundtrip identity for both decoder and Qwen ViT."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig, VitConfig
from flash_vstream_tpu.models.llm import init_llm_params
from flash_vstream_tpu.models.qwen2_vit import init_qwen_vit_params
from flash_vstream_tpu.weights.convert import convert_llama, convert_qwen_vit
from flash_vstream_tpu.weights.export import (
    export_llama,
    export_qwen_vit,
    save_hf_checkpoint,
)

LLM_CFG = LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                    num_layers=2, num_heads=4, num_kv_heads=2,
                    attention_bias=True)
VIT_CFG = VitConfig(hidden_size=16, intermediate_size=32, num_layers=2,
                    num_heads=2, patch_size=2, temporal_patch_size=2,
                    spatial_merge_size=2, use_rope_2d=True, merger_out_dim=24)


def tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, x in fa:
        np.testing.assert_allclose(np.asarray(x), np.asarray(dict(fb)[path]),
                                   rtol=1e-6, err_msg=str(path))


def test_llama_roundtrip():
    params = init_llm_params(jax.random.PRNGKey(0), LLM_CFG)
    sd = export_llama(params, LLM_CFG)
    back = convert_llama(sd, LLM_CFG)
    tree_equal(params, back)


def test_qwen_vit_roundtrip():
    params = init_qwen_vit_params(jax.random.PRNGKey(1), VIT_CFG)
    sd = export_qwen_vit(params, VIT_CFG)
    back = convert_qwen_vit(sd, VIT_CFG)
    tree_equal(params, back)


def test_save_and_load_checkpoint_dir(tmp_path):
    from flash_vstream_tpu.weights.convert import load_safetensors_dir
    params = init_llm_params(jax.random.PRNGKey(0), LLM_CFG)
    sd = export_llama(params, LLM_CFG)
    save_hf_checkpoint(str(tmp_path), sd)
    sd2 = load_safetensors_dir(str(tmp_path))
    assert set(sd2) == set(sd)
    back = convert_llama(sd2, LLM_CFG)
    tree_equal(params, back)
