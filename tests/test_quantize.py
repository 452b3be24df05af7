"""Weight-only int8 quantization: accuracy, memory, end-to-end decode."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.models.layers import dense
from flash_vstream_tpu.models.llm import (
    decoder_forward,
    embed_tokens,
    init_llm_params,
    lm_head,
)
from flash_vstream_tpu.runtime.generation import GenerationConfig, Generator
from flash_vstream_tpu.weights.quantize import (
    QuantWeight,
    dequantize_weight,
    quantize_params,
    quantize_weight,
)

CFG = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2)


def test_quantize_roundtrip(rng):
    w = rng.normal(size=(32, 16)).astype(np.float32)
    qw = quantize_weight(jnp.asarray(w))
    assert qw.q.dtype == jnp.int8
    back = np.asarray(dequantize_weight(qw))
    # per-channel int8: relative error bounded by ~1/127 of channel max
    err = np.abs(back - w).max(0)
    bound = np.abs(w).max(0) / 127.0 * 0.51
    assert (err <= bound + 1e-6).all()


def test_quantized_dense_matches(rng):
    x = rng.normal(size=(4, 32)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    full = np.asarray(dense(jnp.asarray(x), jnp.asarray(w)))
    qout = np.asarray(dense(jnp.asarray(x), quantize_weight(jnp.asarray(w))))
    rel = np.abs(qout - full).max() / np.abs(full).max()
    assert rel < 0.02, rel


def test_w8a8_prefill_dense_matches(rng):
    """w8a8 (int8 activations x int8 weights on the MXU) engages only at
    prefill row counts and stays within quantization error of full fp."""
    from flash_vstream_tpu.models import layers
    from flash_vstream_tpu.weights.quantize import enable_w8a8_prefill
    x = rng.normal(size=(256, 32)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    full = np.asarray(dense(jnp.asarray(x), jnp.asarray(w)))
    qw = quantize_weight(jnp.asarray(w))
    try:
        enable_w8a8_prefill(True)
        qout = np.asarray(dense(jnp.asarray(x), qw))
        # decode-shaped inputs (rows < 128) stay on the weight-only path
        small = np.asarray(dense(jnp.asarray(x[:4]), qw))
    finally:
        enable_w8a8_prefill(False)
    rel = np.abs(qout - full).max() / np.abs(full).max()
    assert rel < 0.03, rel
    weight_only = np.asarray(dense(jnp.asarray(x[:4]), qw))
    assert np.allclose(small, weight_only)
    assert layers.W8A8_PREFILL is False


def test_quantize_params_targets():
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    qp = quantize_params(params)
    assert isinstance(qp["layers"]["attn"]["wq"]["w"], QuantWeight)
    assert isinstance(qp["lm_head"], QuantWeight)
    assert qp["embed"].dtype == params["embed"].dtype       # untouched
    assert qp["layers"]["attn_norm"].dtype == jnp.float32   # untouched


def test_quantized_decode_close_to_full(rng):
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    qp = quantize_params(params)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 8)))
    pos = jnp.arange(8)[None]
    h_full, _ = decoder_forward(params, CFG, embed_tokens(params, ids), pos)
    h_q, _ = decoder_forward(qp, CFG, embed_tokens(qp, ids), pos)
    lf = np.asarray(lm_head(params, CFG, h_full))
    lq = np.asarray(lm_head(qp, CFG, h_q))
    # logits close; top-1 agreement on a short prompt
    assert np.abs(lf - lq).max() < 0.3
    np.testing.assert_array_equal(lf.argmax(-1), lq.argmax(-1))


def test_quantized_generation_runs(rng):
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    qp = quantize_params(params)
    g = Generator(qp, CFG, max_len=64, cache_dtype=jnp.float32)
    embeds = jnp.asarray(rng.normal(size=(1, 6, 64)).astype(np.float32))
    out = g.generate(embeds, jnp.arange(6)[None],
                     GenerationConfig(max_new_tokens=5, eos_token_ids=()))
    assert len(out) == 5


def test_quantized_qwen_pipeline_e2e(rng):
    """Full offline QA through a weight-only int8 pipeline."""
    from flash_vstream_tpu.core.config import tiny_qwen_config
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.preprocess.qwen_processor import make_byte_qwen_tokenizer
    from flash_vstream_tpu.preprocess.video import SyntheticSource
    from flash_vstream_tpu.runtime.pipeline import QwenPipeline
    from flash_vstream_tpu.weights.quantize import quantize_params

    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params)
    pipe = QwenPipeline(qp, cfg, make_byte_qwen_tokenizer(), max_len=1024)
    frames = list(SyntheticSource(6, 56, 56))
    out = pipe.answer(frames, "What?", gen=GenerationConfig(max_new_tokens=6))
    assert isinstance(out, str)
    # full-precision pipeline also runs; exact token agreement is
    # coincidental under quantization, so only check both complete
    pipe_f = QwenPipeline(params, cfg, make_byte_qwen_tokenizer(), max_len=1024)
    out_f = pipe_f.answer(frames, "What?", gen=GenerationConfig(max_new_tokens=6))
    assert isinstance(out_f, str)
