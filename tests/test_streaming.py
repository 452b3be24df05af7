"""Streaming engine tests: fake frame source -> incremental ingest -> QA.

Covers SURVEY.md §4's streaming test strategy (fake frame source) for both
families plus the vmapped multi-stream engine.
"""
import jax
import numpy as np
import pytest

from flash_vstream_tpu.core.config import tiny_llava_config, tiny_qwen_config
from flash_vstream_tpu.models.vstream_llava import init_llava_params
from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
from flash_vstream_tpu.preprocess.qwen_processor import make_byte_qwen_tokenizer
from flash_vstream_tpu.preprocess.tokenizer import ByteTokenizer
from flash_vstream_tpu.preprocess.video import SyntheticSource
from flash_vstream_tpu.runtime.generation import GenerationConfig
from flash_vstream_tpu.runtime.streaming import (
    LLaVAStreamSession,
    MultiStreamEngine,
    QwenStreamSession,
)


@pytest.fixture(scope="module")
def llava_setup():
    cfg = tiny_llava_config()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_llava_stream_session(llava_setup):
    params, cfg = llava_setup
    sess = LLaVAStreamSession(params, cfg, ByteTokenizer(), clip_size=2,
                              max_len=512)
    src = SyntheticSource(10, 112, 112)
    for i in range(0, 10, 2):
        sess.ingest_frames([src[i], src[i + 1]])
    sess.block_until_ingested()
    assert int(sess.state.n_frames) == 10
    out = sess.answer("What happened?", GenerationConfig(max_new_tokens=6))
    assert isinstance(out, str)
    # memory is saturated past the configured lengths
    assert bool(sess.state.long_valid.all())
    m = sess.metrics.as_dict()
    assert m["memory_latency_dispatch"]["count"] == 5


def test_llava_stream_answer_midstream(llava_setup):
    """Questions can be answered at any point; early answers use partial memory."""
    params, cfg = llava_setup
    sess = LLaVAStreamSession(params, cfg, ByteTokenizer(), clip_size=1,
                              max_len=512)
    src = SyntheticSource(4, 112, 112)
    sess.ingest_frames([src[0]])
    out1 = sess.answer("Q?", GenerationConfig(max_new_tokens=4))
    for i in range(1, 4):
        sess.ingest_frames([src[i]])
    out2 = sess.answer("Q?", GenerationConfig(max_new_tokens=4))
    assert isinstance(out1, str) and isinstance(out2, str)


def test_qwen_stream_session():
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=512)
    src = SyntheticSource(12, 56, 56)
    for i in range(0, 12, 2):
        sess.ingest_frames([src[i], src[i + 1]])
    sess.block_until_ingested()
    assert int(sess.state.n_frames) == 6     # frame pairs
    out = sess.answer("What is shown?", GenerationConfig(max_new_tokens=6))
    assert isinstance(out, str)
    # CSM saturated (6 > csm_grid_len=4); timestamps are global pair indices
    assert bool(sess.state.tem_valid.all())
    ts = np.asarray(sess.state.tem_times)
    assert np.all((ts >= 0) & (ts < 6))


def test_qwen_stream_early_answer():
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=512)
    src = SyntheticSource(2, 56, 56)
    sess.ingest_frames([src[0], src[1]])
    out = sess.answer("Q?", GenerationConfig(max_new_tokens=4))
    assert isinstance(out, str)


def test_multi_stream_engine(llava_setup):
    params, cfg = llava_setup
    eng = MultiStreamEngine(params, cfg, ByteTokenizer(), n_streams=3,
                            clip_size=2, max_len=512)
    srcs = [SyntheticSource(8, 112, 112, seed=s) for s in range(3)]
    for i in range(0, 8, 2):
        eng.ingest([[s[i], s[i + 1]] for s in srcs])
    eng.block()
    assert list(np.asarray(eng.states.n_frames)) == [8, 8, 8]
    outs = [eng.answer(j, "Q?", GenerationConfig(max_new_tokens=4))
            for j in range(3)]
    assert all(isinstance(o, str) for o in outs)
    # streams with different content should have different memory
    la = np.asarray(eng.states.long)
    assert not np.allclose(la[0], la[1])


def test_multi_stream_ragged_clips(llava_setup):
    """Streams may receive different numbers of frames per tick."""
    params, cfg = llava_setup
    eng = MultiStreamEngine(params, cfg, ByteTokenizer(), n_streams=2,
                            clip_size=2, max_len=512)
    src = SyntheticSource(4, 112, 112)
    eng.ingest([[src[0], src[1]], [src[2]]])
    eng.ingest([[src[2], src[3]], []])
    eng.block()
    assert list(np.asarray(eng.states.n_frames)) == [4, 1]


def test_multi_stream_batched_answers(llava_setup):
    """answer_all (shared batched decode) matches per-stream answer()."""
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    params, cfg = llava_setup
    eng = MultiStreamEngine(params, cfg, ByteTokenizer(), n_streams=3,
                            clip_size=2, max_len=512)
    srcs = [SyntheticSource(6, 112, 112, seed=s) for s in range(3)]
    for i in range(0, 6, 2):
        eng.ingest([[s[i], s[i + 1]] for s in srcs])
    eng.block()
    gen = GenerationConfig(max_new_tokens=6, eos_token_ids=())
    qs = ["What?", "Where is it?", "Describe the scene now."]
    batched = eng.answer_all(qs, gen)
    single = [eng.answer(i, q, gen) for i, q in enumerate(qs)]
    assert batched == single


def test_qwen_multi_stream_engine():
    from flash_vstream_tpu.runtime.streaming import QwenMultiStreamEngine
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(1), cfg)
    eng = QwenMultiStreamEngine(params, cfg, make_byte_qwen_tokenizer(),
                                n_streams=3, frame_hw=(56, 56), clip_size=2,
                                bank_size=16, max_len=512)
    srcs = [SyntheticSource(12, 56, 56, seed=s) for s in range(3)]
    for i in range(0, 12, 2):
        eng.ingest([[s[i], s[i + 1]] for s in srcs])
    eng.block()
    assert list(np.asarray(eng.states.n_frames)) == [6, 6, 6]
    # memories diverge across streams
    tx = np.asarray(eng.states.tem_x)
    assert not np.allclose(tx[0], tx[1])
    gen = GenerationConfig(max_new_tokens=5, eos_token_ids=())
    qs = ["What?", "Where?", "Which?"]
    batched = eng.answer_all(qs, gen)
    single = [eng.answer(i, q, gen) for i, q in enumerate(qs)]
    assert batched == single


def test_threaded_ingestor():
    from flash_vstream_tpu.runtime.streaming import ThreadedIngestor
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=512)
    frames = list(SyntheticSource(12, 56, 56))
    ing = ThreadedIngestor(sess, frames, fps=0, clip_size=2).start()
    # answer concurrently while ingestion runs (read only host-tracked
    # counts + snapshots: the state pytree is donated by the ingest thread)
    gen = GenerationConfig(max_new_tokens=4)
    answered = 0
    while not ing.wait(timeout=0.001):
        if sess.n_frames > 0:
            out = sess.answer("Q?", gen)
            assert isinstance(out, str)
            answered += 1
    assert ing.frames_ingested == 12
    assert sess.n_frames == 6
    final = sess.answer("Q?", gen)
    assert isinstance(final, str)


def test_session_speculative_matches_fused():
    """Session answers with speculative decoding == the fused greedy path."""
    import dataclasses
    import jax
    import numpy as np
    from flash_vstream_tpu.core.config import tiny_qwen_config
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.preprocess.qwen_processor import (
        make_byte_qwen_tokenizer)
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=2048)
    frames = [np.zeros((56, 56, 3), np.uint8)] * 2
    sess.ingest_frames(frames)
    sess.block_until_ingested()
    gen = GenerationConfig(max_new_tokens=8, eos_token_ids=())
    base = sess.answer("What is happening here?", gen)
    spec = sess.answer("What is happening here?",
                       dataclasses.replace(gen, speculative_k=3,
                                           speculative_ngram=2))
    assert spec == base, (spec, base)


def test_answer_time_merge_matches_full_capacity_merge():
    """Lazy answer-time merge of the bucketed [t_dam, t_csm] slice equals
    the full-capacity merge-then-slice the ingest used to publish: the
    patch merger groups contiguous 4-row windows, and p_full/p_small are
    multiples of 4, so slicing frames commutes with merging."""
    import jax.numpy as jnp
    from flash_vstream_tpu.models.flash_memory import cat_spa_tem
    from flash_vstream_tpu.models.qwen2_vit import patch_merger
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    fm = cfg.flash_memory
    p_full, p_small, D = 16, 4, cfg.vit.hidden_size
    rng = np.random.default_rng(0)
    spa_x = jnp.asarray(rng.normal(size=(fm.dam_grid_len, p_full, D)),
                        jnp.float32)
    tem_x = jnp.asarray(rng.normal(size=(fm.csm_grid_len, p_small, D)),
                        jnp.float32)
    full = patch_merger(params["vit"], cat_spa_tem(spa_x, tem_x))
    t_dam, t_csm = max(fm.dam_grid_len // 2, 1), max(fm.csm_grid_len // 2, 1)
    lazy = patch_merger(params["vit"], jnp.concatenate([
        spa_x[:t_dam].reshape(-1, D),
        tem_x[:t_csm].astype(spa_x.dtype).reshape(-1, D)]))
    n_dam_tok = t_dam * p_full // 4
    want = np.concatenate([
        np.asarray(full[:n_dam_tok]),
        np.asarray(full[fm.dam_grid_len * p_full // 4:][:t_csm * p_small // 4]),
    ])
    np.testing.assert_allclose(np.asarray(lazy), want, rtol=2e-5, atol=2e-5)


def test_qwen_session_save_resume(tmp_path):
    """Session memory checkpoints and resumes: the restored session answers
    identically to the original without re-ingesting (beyond the reference,
    whose streaming bank is process-lifetime only — SURVEY.md §5.4)."""
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    kw = dict(frame_hw=(56, 56), clip_size=2, bank_size=16, max_len=512)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(), **kw)
    src = SyntheticSource(8, 56, 56)
    for i in range(0, 8, 2):
        sess.ingest_frames([src[i], src[i + 1]])
    sess.block_until_ingested()
    gen = GenerationConfig(max_new_tokens=6, eos_token_ids=())
    want = sess.answer("What is shown?", gen)
    path = str(tmp_path / "sess_ckpt")
    sess.save_session(path)

    fresh = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(), **kw)
    fresh.load_session(path)
    assert int(fresh.state.n_frames) == int(sess.state.n_frames)
    assert fresh._published[1] == sess._published[1]
    got = fresh.answer("What is shown?", gen)
    assert got == want, (got, want)
    # the restored session keeps streaming
    fresh.ingest_frames([src[0], src[1]])
    fresh.block_until_ingested()
    assert int(fresh.state.n_frames) == int(sess.state.n_frames) + 1


def test_llava_session_save_resume(tmp_path, llava_setup):
    params, cfg = llava_setup
    kw = dict(clip_size=2, max_len=512)
    sess = LLaVAStreamSession(params, cfg, ByteTokenizer(), **kw)
    src = SyntheticSource(6, 112, 112)
    for i in range(0, 6, 2):
        sess.ingest_frames([src[i], src[i + 1]])
    sess.block_until_ingested()
    gen = GenerationConfig(max_new_tokens=4)
    want = sess.answer("Q?", gen)
    path = str(tmp_path / "sess_ckpt")
    sess.save_session(path)

    fresh = LLaVAStreamSession(params, cfg, ByteTokenizer(), **kw)
    fresh.load_session(path)
    got = fresh.answer("Q?", gen)
    assert got == want, (got, want)


def test_session_resume_shape_mismatch_raises(tmp_path):
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=512)
    src = SyntheticSource(2, 56, 56)
    sess.ingest_frames([src[0], src[1]])
    sess.block_until_ingested()
    path = str(tmp_path / "sess_ckpt")
    sess.save_session(path)
    other = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                              frame_hw=(56, 56), clip_size=2, bank_size=32,
                              max_len=512)
    with pytest.raises(AssertionError, match="bank_size"):
        other.load_session(path)


def test_clone_fresh_shares_jits_independent_state():
    """clone_fresh: a new stream shares the template's params and compiled
    callables (trace/compile once, serve many — the HTTP server's
    per-stream factory) but owns independent memory state/counters."""
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=512)
    src = SyntheticSource(4, 56, 56)
    sess.ingest_frames([src[0], src[1]])
    clone = sess.clone_fresh()
    # shared compiled surface
    assert clone._ingest is sess._ingest
    assert clone.generator is sess.generator
    assert clone.params is sess.params
    assert clone._fused_cache is sess._fused_cache
    # independent stream state
    assert clone._published == (None, 0)
    assert int(clone.state.n_frames) == 0
    assert int(sess.state.n_frames) == 1         # template unaffected
    clone.ingest_frames([src[2], src[3]])
    clone.block_until_ingested()
    assert int(clone.state.n_frames) == 1
    assert int(sess.state.n_frames) == 1
    # both answer against their own snapshots
    a1 = sess.answer("Q?", GenerationConfig(max_new_tokens=4))
    a2 = clone.answer("Q?", GenerationConfig(max_new_tokens=4))
    assert isinstance(a1, str) and isinstance(a2, str)
    # metrics are per-clone
    assert clone.metrics is not sess.metrics


def test_session_preemptible_matches_fused():
    """Preemptible (chunk-stitched) answers == the fused one-dispatch path."""
    import dataclasses
    import jax
    import numpy as np
    from flash_vstream_tpu.core.config import tiny_qwen_config
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=2048)
    frames = [np.zeros((56, 56, 3), np.uint8)] * 2
    sess.ingest_frames(frames)
    sess.block_until_ingested()
    gen = GenerationConfig(max_new_tokens=8, eos_token_ids=())
    base = sess.answer("What is happening here?", gen)
    pre = sess.answer("What is happening here?",
                      dataclasses.replace(gen, preemptible_chunk=3))
    assert pre == base, (pre, base)
