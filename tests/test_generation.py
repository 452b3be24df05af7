"""Generation paths: compiled while-loop decode == stepwise decode; EOS stop."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.models.llm import init_llm_params
from flash_vstream_tpu.runtime.generation import GenerationConfig, Generator

CFG = LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=2)


def make_gen():
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    return Generator(params, CFG, max_len=64, cache_dtype=jnp.float32)


def test_compiled_matches_stepwise(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 6, 32)).astype(np.float32))
    pos = jnp.arange(6)[None]
    cfg = GenerationConfig(max_new_tokens=10, eos_token_ids=())
    compiled = g.generate(embeds, pos, cfg)
    stepwise = g.generate(embeds, pos, cfg, stream=True)
    assert compiled == stepwise


def test_eos_stops_decode(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    # find which token greedy produces first, then use it as EOS
    first = g.generate(embeds, pos, GenerationConfig(max_new_tokens=1))[0]
    out = g.generate(embeds, pos, GenerationConfig(max_new_tokens=10,
                                                   eos_token_ids=(first,)))
    assert out == [first]


def test_max_new_tokens_bound(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    out = g.generate(embeds, pos, GenerationConfig(max_new_tokens=3,
                                                   eos_token_ids=()))
    assert len(out) == 3


def test_topk_one_is_greedy(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    greedy = g.generate(embeds, pos, GenerationConfig(max_new_tokens=5))
    topk1 = g.generate(embeds, pos, GenerationConfig(max_new_tokens=5,
                                                     temperature=1.0, top_k=1))
    assert greedy == topk1


def test_active_len_bucket(rng):
    """Per-answer KV buckets: a huge session max_len must not inflate the
    answer's cache (decode reads the whole cache buffer each token), and
    results are identical across bucket sizes."""
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    g_small = Generator(params, CFG, max_len=64, cache_dtype=jnp.float32)
    g_big = Generator(params, CFG, max_len=4096, cache_dtype=jnp.float32)
    assert g_big._active_len(6, 10) == 256          # 256-rounded tight bucket
    assert g_small._active_len(6, 10) == 64         # clamped to max_len
    embeds = jnp.asarray(rng.normal(size=(1, 6, 32)).astype(np.float32))
    pos = jnp.arange(6)[None]
    cfg = GenerationConfig(max_new_tokens=10, eos_token_ids=())
    assert g_small.generate(embeds, pos, cfg) == g_big.generate(embeds, pos,
                                                                cfg)


def test_int8_cache_matches_f32(rng):
    """int8 KV cache greedy decode agrees with the f32 cache."""
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    g_f = Generator(params, CFG, max_len=64, cache_dtype=jnp.float32)
    g_q = Generator(params, CFG, max_len=64, cache_dtype=jnp.int8)
    embeds = jnp.asarray(rng.normal(size=(1, 8, 32)).astype(np.float32) * 0.1)
    pos = jnp.arange(8)[None]
    cfg = GenerationConfig(max_new_tokens=8, eos_token_ids=())
    out_f = g_f.generate(embeds, pos, cfg)
    out_q = g_q.generate(embeds, pos, cfg)
    agree = sum(a == b for a, b in zip(out_f, out_q))
    assert agree >= len(out_f) - 1, (out_f, out_q)


def test_stop_strings_trim():
    from flash_vstream_tpu.runtime.generation import trim_stop_strings
    assert trim_stop_strings("a cat</s> junk", ("</s>",)) == "a cat"
    assert trim_stop_strings("plain answer", ("</s>",)) == "plain answer"
    assert trim_stop_strings("x<|im_end|>\ny", ("<|im_end|>",)) == "x"


def test_sampling_respects_topk(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    # high temperature but top_k=2: tokens restricted to the 2 best per step
    out = g.generate(embeds, pos, GenerationConfig(
        max_new_tokens=6, temperature=5.0, top_k=2, seed=1))
    assert len(out) == 6


def test_speculative_prompt_lookup_exact():
    """Prompt-lookup speculative decoding emits EXACTLY the greedy output.
    Case 2 seeds the context with the model's own continuation so drafts
    ACCEPT (the multi-token verify path is exercised), and the output must
    still match token-for-token."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flash_vstream_tpu.core.config import LLMConfig
    from flash_vstream_tpu.models.llm import embed_tokens, init_llm_params
    from flash_vstream_tpu.runtime.generation import (GenerationConfig,
                                                      Generator)
    cfg = LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, num_kv_heads=2)
    params = init_llm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    g = Generator(params, cfg, max_len=512, cache_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 63, 12)
    embeds = embed_tokens(params, jnp.asarray(prompt)[None])
    pos = jnp.arange(12)[None]

    base_gen = GenerationConfig(max_new_tokens=12, eos_token_ids=())
    base = g.generate(embeds, pos, base_gen)

    # 1) cold context (few matches): still exact
    spec_gen = dataclasses.replace(base_gen, speculative_k=3,
                                   speculative_ngram=2)
    spec = g.generate(embeds, pos, spec_gen, context_ids=prompt)
    assert spec == base, (spec, base)

    # 2) context seeded with the true continuation: drafts accept
    ctx = np.concatenate([prompt, np.asarray(base, np.int64), prompt])
    spec2 = g.generate(embeds, pos, spec_gen, context_ids=ctx)
    assert spec2 == base, (spec2, base)

    # 3) EOS mid-stream: equivalence incl. early stop
    eos_gen = dataclasses.replace(base_gen, eos_token_ids=(int(base[3]),))
    base_eos = g.generate(embeds, pos, eos_gen)
    spec_eos = g.generate(embeds, pos,
                          dataclasses.replace(eos_gen, speculative_k=3,
                                              speculative_ngram=2),
                          context_ids=ctx)
    assert spec_eos == base_eos, (spec_eos, base_eos)

    # 4) int8 KV cache path
    g8 = Generator(params, cfg, max_len=512, cache_dtype=jnp.int8)
    b8 = g8.generate(embeds, pos, base_gen)
    s8 = g8.generate(embeds, pos, spec_gen, context_ids=ctx)
    assert s8 == b8, (s8, b8)


def test_preemptible_chunks_match_fused(rng):
    """Chunked greedy decode (preemptible answers) emits exactly the fused
    loop's tokens for every chunk size, including non-dividing ones."""
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 6, 32)).astype(np.float32))
    pos = jnp.arange(6)[None]
    fused = g.generate(embeds, pos, GenerationConfig(max_new_tokens=10))
    for chunk in (1, 3, 4, 16):
        chunked = g.generate(embeds, pos, GenerationConfig(
            max_new_tokens=10, preemptible_chunk=chunk))
        assert chunked == fused, chunk


def test_preemptible_eos_mid_chunk(rng):
    """EOS inside a chunk stops the stitched decode exactly like the fused
    loop (no trailing frozen tokens from later chunks)."""
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    toks = g.generate(embeds, pos, GenerationConfig(max_new_tokens=8,
                                                    eos_token_ids=()))
    eos = toks[2]          # third greedy token becomes the EOS
    fused = g.generate(embeds, pos, GenerationConfig(max_new_tokens=8,
                                                     eos_token_ids=(eos,)))
    chunked = g.generate(embeds, pos, GenerationConfig(
        max_new_tokens=8, eos_token_ids=(eos,), preemptible_chunk=2))
    assert chunked == fused


def test_preemptible_prefill_chunks_match_fused(rng):
    """Chunked PREFILL (prefill_chunk with preemptible_chunk: sequence
    chunks through the decode_multi path against the growing cache) emits
    exactly the fused prefill's tokens — dividing and non-dividing chunk
    sizes, right-padded prompts, and the int8 KV cache."""
    import dataclasses

    from flash_vstream_tpu.models.llm import embed_tokens, init_llm_params

    # head_dim = 8 -> mrope sections sum to 4
    cfg = dataclasses.replace(CFG, mrope_sections=(1, 1, 2), rope_theta=1e6)
    params = init_llm_params(jax.random.PRNGKey(3), cfg)
    S, real = 24, 19
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size - 1, (1, S)))
    embeds = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, 1, S))
    seg = jnp.where(jnp.arange(S)[None] < real, 0, -1)
    last = jnp.asarray([real - 1])
    for cache_dtype in (jnp.float32, jnp.int8):
        g = Generator(params, cfg, max_len=64, cache_dtype=cache_dtype)
        fused = g.generate(embeds, pos,
                           GenerationConfig(max_new_tokens=6,
                                            eos_token_ids=(),
                                            preemptible_chunk=2),
                           segment_ids=seg, last_real_idx=last)
        for chunk in (5, 8, 24, 32):
            chunked = g.generate(embeds, pos, GenerationConfig(
                max_new_tokens=6, eos_token_ids=(), preemptible_chunk=2,
                prefill_chunk=chunk),
                segment_ids=seg, last_real_idx=last)
            assert chunked == fused, (cache_dtype, chunk, chunked, fused)
