import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig, VitConfig
from flash_vstream_tpu.models.clip_vit import clip_encode, init_clip_params, patchify_images
from flash_vstream_tpu.models.layers import KVCache
from flash_vstream_tpu.models.llm import (
    cross_entropy_loss,
    decoder_forward,
    embed_tokens,
    init_llm_params,
    lm_head,
)
from flash_vstream_tpu.models.qwen2_vit import (
    grid_positions,
    grid_segments,
    init_qwen_vit_params,
    patch_merger,
    prepare_vit_inputs,
    qwen_vit_blocks,
)

LLM_CFG = LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, num_kv_heads=2,
                    max_position_embeddings=128)
MROPE_CFG = LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      attention_bias=True, mrope_sections=(2, 1, 1))


def test_decoder_forward_shapes(rng):
    params = init_llm_params(jax.random.PRNGKey(0), LLM_CFG)
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 10)))
    pos = jnp.broadcast_to(jnp.arange(10)[None], (2, 10))
    h, _ = decoder_forward(params, LLM_CFG, embed_tokens(params, ids), pos)
    logits = lm_head(params, LLM_CFG, h)
    assert logits.shape == (2, 10, 64)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_decode_matches_full_forward(rng):
    """Prefill + cached decode must equal the uncached full forward."""
    cfg = LLM_CFG
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    S, extra = 6, 3
    ids = jnp.asarray(rng.integers(0, 64, size=(1, S + extra)))
    pos_full = jnp.arange(S + extra)[None]

    h_full, _ = decoder_forward(params, cfg, embed_tokens(params, ids), pos_full)
    logits_full = lm_head(params, cfg, h_full)

    cache = KVCache.create(cfg.num_layers, 1, cfg.num_kv_heads, 32,
                           cfg.head_dim, dtype=jnp.float32)
    h_pre, cache = decoder_forward(params, cfg,
                                   embed_tokens(params, ids[:, :S]),
                                   pos_full[:, :S], cache=cache)
    step_logits = [lm_head(params, cfg, h_pre)[:, -1]]
    for i in range(extra):
        tok = ids[:, S + i:S + i + 1]
        h, cache = decoder_forward(params, cfg, embed_tokens(params, tok),
                                   pos_full[:, S + i:S + i + 1], cache=cache)
        step_logits.append(lm_head(params, cfg, h)[:, -1])

    got = np.stack([np.asarray(x) for x in step_logits], axis=1)
    want = np.asarray(logits_full[:, S - 1:])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mrope_equals_1d_for_text(rng):
    """With equal t/h/w positions, M-RoPE must reduce to 1D RoPE."""
    params = init_llm_params(jax.random.PRNGKey(0), MROPE_CFG)
    ids = jnp.asarray(rng.integers(0, 64, size=(1, 8)))
    x = embed_tokens(params, ids)
    pos1d = jnp.arange(8)[None]
    pos3d = jnp.broadcast_to(jnp.arange(8)[None, None], (3, 1, 8))
    h1, _ = decoder_forward(params, MROPE_CFG, x, pos1d)
    h3, _ = decoder_forward(params, MROPE_CFG, x, pos3d)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h3), rtol=1e-5, atol=1e-5)


def test_padding_with_segment_ids(rng):
    """Left-padding via segment ids must not change the real tokens' output."""
    cfg = LLM_CFG
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, 64, size=(1, 6)))
    pos = jnp.arange(6)[None]
    h_ref, _ = decoder_forward(params, cfg, embed_tokens(params, ids), pos)

    pad = 4
    ids_p = jnp.concatenate([jnp.zeros((1, pad), ids.dtype), ids], axis=1)
    pos_p = jnp.concatenate([jnp.zeros((1, pad), pos.dtype), pos], axis=1)
    seg = jnp.asarray([[-1] * pad + [0] * 6], jnp.int32)
    h_pad, _ = decoder_forward(params, cfg, embed_tokens(params, ids_p), pos_p,
                               segment_ids=seg)
    np.testing.assert_allclose(np.asarray(h_pad)[:, pad:], np.asarray(h_ref),
                               rtol=1e-4, atol=1e-4)


def test_cross_entropy_loss(rng):
    logits = jnp.asarray(rng.normal(size=(1, 5, 8)).astype(np.float32))
    labels = jnp.asarray([[1, 2, -100, 3, -100]])
    loss = cross_entropy_loss(logits, labels)
    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    want = -(lp[0, 0, 2] + lp[0, 2, 3]) / 2  # shifted targets at steps 0 and 2
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


VIT_CFG = VitConfig(hidden_size=16, intermediate_size=32, num_layers=3,
                    num_heads=2, patch_size=4, image_size=16, select_layer=-2)


def test_clip_encode(rng):
    params = init_clip_params(jax.random.PRNGKey(0), VIT_CFG)
    imgs = jnp.asarray(rng.normal(size=(2, 3, 16, 16)).astype(np.float32))
    out = clip_encode(params, VIT_CFG, imgs)
    assert out.shape == (2, 16, 16)   # 4x4 patches, CLS dropped
    assert np.isfinite(np.asarray(out)).all()


def test_patchify_images(rng):
    imgs = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    p = np.asarray(patchify_images(jnp.asarray(imgs), 4))
    assert p.shape == (1, 4, 48)
    # first patch = channels-first flattening of the top-left 4x4 block
    np.testing.assert_allclose(p[0, 0], imgs[0, :, :4, :4].reshape(-1))


QVIT_CFG = VitConfig(hidden_size=16, intermediate_size=32, num_layers=2,
                     num_heads=2, patch_size=2, image_size=0,
                     temporal_patch_size=2, spatial_merge_size=2,
                     use_rope_2d=True, merger_out_dim=24)


def test_qwen_vit_grid_metadata():
    grids = [(2, 4, 4), (1, 2, 2)]
    pos = grid_positions(grids)
    seg = grid_segments(grids)
    assert pos.shape == (2 * 16 + 4, 2)
    # first window of grid 0: (h,w) = (0,0),(0,1),(1,0),(1,1)
    np.testing.assert_array_equal(pos[:4], [[0, 0], [0, 1], [1, 0], [1, 1]])
    # second window: w advances by 2
    np.testing.assert_array_equal(pos[4:8], [[0, 2], [0, 3], [1, 2], [1, 3]])
    # segments: one per temporal frame of each grid
    assert list(np.unique(seg)) == [0, 1, 2]
    assert (seg[:16] == 0).all() and (seg[16:32] == 1).all() and (seg[32:] == 2).all()


def test_qwen_vit_forward(rng):
    params = init_qwen_vit_params(jax.random.PRNGKey(0), QVIT_CFG)
    grids = [(2, 4, 4)]
    S = 32
    pd = 3 * 2 * 2 * 2
    patches = rng.normal(size=(S, pd)).astype(np.float32)
    pos, seg = prepare_vit_inputs(grids, pad_to=40)
    patches_p = np.pad(patches, ((0, 8), (0, 0)))
    out = qwen_vit_blocks(params, QVIT_CFG, jnp.asarray(patches_p),
                          jnp.asarray(pos), jnp.asarray(seg))
    assert out.shape == (40, 16)
    merged = patch_merger(params, out[:S])
    assert merged.shape == (8, 24)
    assert np.isfinite(np.asarray(merged)).all()
    # padding invariance: different pad size, same real-token output
    pos2, seg2 = prepare_vit_inputs(grids, pad_to=48)
    patches_p2 = np.pad(patches, ((0, 16), (0, 0)))
    out2 = qwen_vit_blocks(params, QVIT_CFG, jnp.asarray(patches_p2),
                           jnp.asarray(pos2), jnp.asarray(seg2))
    np.testing.assert_allclose(np.asarray(out)[:S], np.asarray(out2)[:S],
                               rtol=1e-4, atol=1e-4)


def test_qwen_vit_frames_matches_segments(rng):
    """Frame-batched encoder == segment-masked encoder (uniform grids)."""
    from flash_vstream_tpu.models.qwen2_vit import qwen_vit_blocks_frames
    params = init_qwen_vit_params(jax.random.PRNGKey(0), QVIT_CFG)
    t, h, w = 3, 4, 4
    th, tw = 2, 2   # pooled grid
    S = t * h * w + t * th * tw
    pd = 3 * 2 * 2 * 2
    patches = rng.normal(size=(S, pd)).astype(np.float32)
    grids = [(t, h, w), (t, th, tw)]
    pos, seg = prepare_vit_inputs(grids, pad_to=S)
    want = qwen_vit_blocks(params, QVIT_CFG, jnp.asarray(patches),
                           jnp.asarray(pos), jnp.asarray(seg))
    got = qwen_vit_blocks_frames(params, QVIT_CFG, jnp.asarray(patches),
                                 t_full=t, hw_full=(h, w),
                                 t_small=t, hw_small=(th, tw))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cross_entropy_chunked_matches_full():
    """Chunked CE (no [S, vocab] logits in memory) == plain CE, values and
    gradients, incl. a chunk size that does not divide the sequence."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flash_vstream_tpu.core.config import LLMConfig
    from flash_vstream_tpu.models.llm import (cross_entropy_loss,
                                              cross_entropy_loss_chunked,
                                              init_llm_params, lm_head)
    cfg = LLMConfig(vocab_size=97, hidden_size=16, intermediate_size=32,
                    num_layers=1, num_heads=2, num_kv_heads=2)
    params = init_llm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 2, 23
    h = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    labels = labels.at[:, :5].set(-100)

    def full(params, h):
        return cross_entropy_loss(lm_head(params, cfg, h), labels)

    def chunked(params, h):
        return cross_entropy_loss_chunked(params, cfg, h, labels, chunk=8)

    lf, gf = jax.value_and_grad(full, argnums=1)(params, h)
    lc, gc = jax.value_and_grad(chunked, argnums=1)(params, h)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gf),
                               rtol=1e-5, atol=1e-6)

    # vocab-tiled online-LSE path (incl. a tile that does not divide V):
    # values AND gradients match the plain path
    def tiled(params, h):
        return cross_entropy_loss_chunked(params, cfg, h, labels, chunk=8,
                                          vocab_tile=40)

    lt, gt = jax.value_and_grad(tiled, argnums=1)(params, h)
    np.testing.assert_allclose(float(lt), float(lf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gf),
                               rtol=1e-5, atol=1e-6)


def test_cross_entropy_vocab_tiled_int8_head():
    """With an int8 QuantWeight lm_head the tiled path (which never
    dequantizes the full head) == dequantize-then-chunked, values + grads;
    tiling also auto-enables for QuantWeight heads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flash_vstream_tpu.core.config import LLMConfig
    from flash_vstream_tpu.models.llm import (cross_entropy_loss_chunked,
                                              init_llm_params)
    from flash_vstream_tpu.weights.quantize import (dequantize_weight,
                                                    quantize_weight)
    cfg = LLMConfig(vocab_size=96, hidden_size=16, intermediate_size=32,
                    num_layers=1, num_heads=2, num_kv_heads=2)
    params = init_llm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["lm_head"] = quantize_weight(params["lm_head"])
    deq = dict(params, lm_head=dequantize_weight(params["lm_head"],
                                                 jnp.float32))
    rng = np.random.default_rng(1)
    B, S = 1, 17
    h = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    labels = labels.at[:, :3].set(-100)

    def ref(h):
        return cross_entropy_loss_chunked(deq, cfg, h, labels, chunk=8)

    def tiled(h):   # vocab_tile defaults on for QuantWeight heads
        return cross_entropy_loss_chunked(params, cfg, h, labels, chunk=8)

    lr_, gr = jax.value_and_grad(ref)(h)
    lt, gt = jax.value_and_grad(tiled)(h)
    np.testing.assert_allclose(float(lt), float(lr_), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                               rtol=1e-5, atol=1e-6)


def test_swiglu_seq_chunk_matches():
    """Sequence-chunked SwiGLU (training memory cap) == monolithic, values
    and gradients, incl. a chunk that does not divide S (divisor fallback)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flash_vstream_tpu.models.layers import init_dense, swiglu_mlp
    rng = np.random.default_rng(0)
    D, I = 16, 32
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {"gate": init_dense(keys[0], D, I),
              "up": init_dense(keys[1], D, I),
              "down": init_dense(keys[2], I, D)}
    x = jnp.asarray(rng.normal(size=(1, 14, D)), jnp.float32)

    def f_full(x):
        return jnp.sum(swiglu_mlp(params, x) ** 2)

    def f_chunk(x):
        return jnp.sum(swiglu_mlp(params, x, seq_chunk=4) ** 2)  # -> 2

    lf, gf = jax.value_and_grad(f_full)(x)
    lc, gc = jax.value_and_grad(f_chunk)(x)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gf), rtol=1e-5)
