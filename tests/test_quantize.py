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


# ---------------------------------------------------------------------------
# int4 (QLoRA base precision; reference trains over a bnb 4-bit base)
# ---------------------------------------------------------------------------

def test_quantize4_roundtrip(rng):
    """Packed int4 with per-(block, out-channel) scales: error bounded by
    half a quantization step of the BLOCK scale, incl. leading layer dims
    and a non-power-of-two input dim (1176 -> even divisor blocks)."""
    from flash_vstream_tpu.weights.quantize import (dequantize_weight4,
                                                    quantize_weight4)
    for shape, block in (((2, 256, 48), 128), ((1176, 16), 128),
                         ((64, 24), 16)):
        w = rng.normal(size=shape).astype(np.float32)
        qw = quantize_weight4(jnp.asarray(w), block=block)
        assert qw.q4.dtype == jnp.uint8
        assert qw.q4.shape[-2] == shape[-2] // 2
        nb = qw.scale.shape[-2]
        assert shape[-2] % nb == 0 and (shape[-2] // nb) % 2 == 0
        back = np.asarray(dequantize_weight4(qw, jnp.float32))
        bs = shape[-2] // nb
        wb = w.reshape(*shape[:-2], nb, bs, shape[-1])
        eb = np.abs(back.reshape(wb.shape) - wb).max(-2)
        bound = np.abs(wb).max(-2) / 7.0 * 0.51
        assert (eb <= bound + 1e-6).all()


def test_quantize4_packing_order(rng):
    """Nibble layout: low = row i, high = row i + din//2 (split-half)."""
    from flash_vstream_tpu.weights.quantize import (quantize_weight4,
                                                    unpack_weight4)
    w = rng.normal(size=(8, 4)).astype(np.float32)
    qw = quantize_weight4(jnp.asarray(w), block=8)
    q = np.asarray(unpack_weight4(qw))
    scale = np.asarray(qw.scale)                 # [1, 4]
    expect = np.clip(np.round(w / scale[0]), -7, 7).astype(np.int8)
    np.testing.assert_array_equal(q, expect)


def test_quantized4_dense_matches(rng):
    from flash_vstream_tpu.weights.quantize import quantize_weight4
    x = rng.normal(size=(4, 128)).astype(np.float32)
    w = rng.normal(size=(128, 16)).astype(np.float32)
    full = np.asarray(dense(jnp.asarray(x), jnp.asarray(w)))
    q4out = np.asarray(dense(jnp.asarray(x),
                             quantize_weight4(jnp.asarray(w), block=32)))
    rel = np.abs(q4out - full).max() / np.abs(full).max()
    assert rel < 0.12, rel           # 4-bit: ~16x coarser than int8


def test_quantize_params4_targets():
    from flash_vstream_tpu.weights.quantize import (QuantWeight4,
                                                    quantize_params4)
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    qp = quantize_params4(params, block=32)
    assert isinstance(qp["layers"]["attn"]["wq"]["w"], QuantWeight4)
    assert isinstance(qp["lm_head"], QuantWeight4)
    assert qp["embed"].dtype == params["embed"].dtype       # untouched
    assert qp["layers"]["attn_norm"].dtype == jnp.float32   # untouched


def test_quantized4_decoder_runs(rng):
    """Full decoder forward over an int4 base stays close to fp and keeps
    top-1 agreement on a short prompt (random tiny weights)."""
    from flash_vstream_tpu.weights.quantize import quantize_params4
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    qp = quantize_params4(params, block=32)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 12)))
    pos = jnp.arange(12)[None]
    h_full, _ = decoder_forward(params, CFG, embed_tokens(params, ids), pos)
    h_q, _ = decoder_forward(qp, CFG, embed_tokens(qp, ids), pos)
    lf = np.asarray(lm_head(params, CFG, h_full))
    lq = np.asarray(lm_head(qp, CFG, h_q))
    assert np.isfinite(lq).all()
    # drift bound only: random-init logits are near-uniform, so top-1
    # agreement is not a meaningful 4-bit check (int8 asserts it above)
    assert np.abs(lf - lq).max() < 1.5


def test_lora_over_int4_base(rng):
    """QLoRA-4: adapters init/view/merge over an int4 base tree; the
    merge-free view trains (grads flow to adapters only)."""
    from flash_vstream_tpu.train.lora import (init_lora_params, lora_views,
                                              merge_lora)
    from flash_vstream_tpu.weights.quantize import quantize_params4
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    base = {"llm": quantize_params4(params, block=32)}
    lora = init_lora_params(jax.random.PRNGKey(1), base, rank=4)
    assert "llm/layers/attn/wq/w" in lora
    a = lora["llm/layers/attn/wq/w"]["a"]
    assert a.shape == (CFG.num_layers, CFG.hidden_size, 4)

    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)))
    pos = jnp.arange(8)[None]

    def loss(lp):
        eff = lora_views(base, lp, alpha=8, rank=4)["llm"]
        h, _ = decoder_forward(eff, CFG, embed_tokens(eff, ids), pos)
        return jnp.mean(lm_head(eff, CFG, h) ** 2)

    g = jax.grad(loss)(lora)
    gb = g["llm/layers/attn/wq/w"]["b"]
    assert np.isfinite(np.asarray(gb)).all()
    assert float(jnp.abs(gb).sum()) > 0          # b receives signal via a@b
    merged = merge_lora(base, lora, alpha=8, rank=4)
    assert merged["llm"]["layers"]["attn"]["wq"]["w"].shape[-2:] == (
        CFG.hidden_size, CFG.hidden_size)


def test_int4_embed_tokens_matches_dequant(rng):
    """Gather-time int4 dequant == dequantize-then-gather (both parities,
    block boundaries)."""
    from flash_vstream_tpu.weights.quantize import (dequantize_weight4,
                                                    quantize_weight4)
    V, D = 64, 8
    w = rng.normal(size=(V, D)).astype(np.float32) * 0.02
    qw = quantize_weight4(jnp.asarray(w), block=16)
    ids = jnp.asarray(rng.integers(0, V, (2, 9)))
    got = np.asarray(embed_tokens({"embed": qw}, ids), np.float32)
    full = np.asarray(dequantize_weight4(qw, jnp.bfloat16), np.float32)
    np.testing.assert_allclose(got, full[np.asarray(ids)], rtol=1e-2,
                               atol=1e-4)


def test_int4_matmul_kernel_matches_dequant(rng):
    """Pallas decode matvec (packed-byte read + in-VMEM unpack/scale) vs the
    XLA dequant reference, interpret mode on CPU — covers multi-block
    scales, both halves of the split-half packing, and B > 1 rows."""
    from jax.experimental.pallas import tpu as pltpu
    from flash_vstream_tpu.kernels.int4_matmul import (int4_matmul,
                                                       int4_matmul_supported)
    from flash_vstream_tpu.weights.quantize import (dequantize_weight4,
                                                    quantize_weight4)
    B, din, dout = 4, 512, 384
    w = rng.normal(size=(din, dout)).astype(np.float32)
    qw = quantize_weight4(jnp.asarray(w), block=128)
    assert int4_matmul_supported(B, qw.q4.shape[0], qw.scale.shape[0], dout)
    x = jnp.asarray(rng.normal(size=(B, din)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    want = np.asarray(jnp.dot(x, dequantize_weight4(qw, jnp.bfloat16),
                              preferred_element_type=jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(int4_matmul(x, qw.q4, qw.scale,
                                     out_dtype=jnp.float32))
    # the kernel is slightly MORE exact than the reference (integer bf16
    # dot + f32 block scaling vs dequant rounded to bf16 before the dot),
    # so the bound is bf16 rounding of the reference, not kernel error
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.25)


def test_int4_matmul_support_gate():
    from flash_vstream_tpu.kernels.int4_matmul import int4_matmul_supported
    assert int4_matmul_supported(1, 1792, 28, 18944)      # Qwen-7B mlp up
    assert int4_matmul_supported(8, 9472, 148, 3584)      # mlp down
    assert int4_matmul_supported(1, 1792, 28, 151936)     # lm_head (blk 128)
    assert not int4_matmul_supported(64, 1792, 28, 18944)  # prefill rows
    assert not int4_matmul_supported(1, 1792, 7, 18944)    # odd block count
    assert not int4_matmul_supported(1, 48, 2, 18944)      # sublane misfit


def test_int8_vit_session_and_encode_fidelity(rng):
    """Opt-in int8 ViT (profile_ingest --int8-vit / BENCH_INT8_VIT): the
    quantized block stack must (a) leave patch_embed/merger untouched,
    (b) drive a full session end-to-end, and (c) track the bf16 encode —
    weight-only int8 and w8a8 both stay highly correlated per token."""
    import dataclasses

    from flash_vstream_tpu.core.config import tiny_qwen_config
    from flash_vstream_tpu.models.qwen2_vit import qwen_vit_blocks_frames
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.models import layers
    from flash_vstream_tpu.preprocess.qwen_processor import (
        make_byte_qwen_tokenizer)
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession
    from flash_vstream_tpu.weights.quantize import (QuantWeight,
                                                    quantize_params)

    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    qvit = quantize_params(params["vit"])
    assert isinstance(qvit["layers"]["attn"]["wq"]["w"], QuantWeight)
    assert isinstance(qvit["layers"]["mlp"]["fc1"]["w"], QuantWeight)
    assert not isinstance(qvit["patch_embed"]["w"], QuantWeight)
    assert not isinstance(qvit["merger"]["fc1"]["w"], QuantWeight)

    t, gh, gw = 2, 8, 8
    P, Ps = gh * gw, (gh // 2) * (gw // 2)
    pd = cfg.vit.in_channels * cfg.vit.temporal_patch_size * 14 ** 2
    patches = jnp.asarray(rng.normal(size=(t * (P + Ps), pd)), jnp.float32)
    kw = dict(t_full=t, hw_full=(gh, gw), t_small=t, hw_small=(gh//2, gw//2))
    ref = np.asarray(qwen_vit_blocks_frames(params["vit"], cfg.vit,
                                            patches, **kw), np.float32)

    def cos(a, b):
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
        return (num / den).mean()

    got = np.asarray(qwen_vit_blocks_frames(qvit, cfg.vit, patches, **kw),
                     np.float32)
    assert cos(got, ref) > 0.995, cos(got, ref)

    old = layers.W8A8_PREFILL
    try:
        layers.W8A8_PREFILL = True
        got8 = np.asarray(qwen_vit_blocks_frames(qvit, cfg.vit, patches,
                                                 **kw), np.float32)
        assert cos(got8, ref) > 0.99, cos(got8, ref)

        # end-to-end: a session over the quantized tower answers finitely
        qparams = dict(params, vit=qvit)
        sess = QwenStreamSession(qparams, cfg, make_byte_qwen_tokenizer(),
                                 frame_hw=(56, 56), clip_size=2,
                                 bank_size=16, max_len=512)
        frames = [np.asarray(rng.integers(0, 255, (56, 56, 3)), np.uint8)
                  for _ in range(2)]
        for _ in range(3):
            sess.ingest_frames(frames)
        sess.block_until_ingested()
        assert bool(jnp.isfinite(
            sess.state.tem_x.astype(jnp.float32)).all())
        out = sess.answer("What?", GenerationConfig(max_new_tokens=4))
        assert isinstance(out, str)
    finally:
        layers.W8A8_PREFILL = old
