"""Disaggregated ingest/decode serving (parallel/serve.py): the slice-level
mapping of the reference's 2-GPU split (cli_server_2gpu.py:197-239 — frame
memory manager pinned to cuda:1, LLM on cuda:0), validated on the virtual
8-device CPU mesh."""
import threading

import numpy as np
import pytest

import jax

from flash_vstream_tpu.core.config import tiny_qwen_config
from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
from flash_vstream_tpu.parallel.serve import (make_serve_placement,
                                              place_qwen_serve_params)
from flash_vstream_tpu.preprocess.qwen_processor import (
    make_byte_qwen_tokenizer)
from flash_vstream_tpu.runtime.generation import GenerationConfig
from flash_vstream_tpu.runtime.streaming import QwenStreamSession

pytestmark = pytest.mark.skipif(len(jax.devices()) < 3,
                                reason="needs >= 3 devices")


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(7), cfg)
    return cfg, params, make_byte_qwen_tokenizer()


def _mk(cfg, params, tok, placement):
    return QwenStreamSession(params, cfg, tok, frame_hw=(56, 56),
                             clip_size=2, bank_size=32, max_len=512,
                             placement=placement)


def test_placement_split(setup):
    cfg, params, _ = setup
    pl = make_serve_placement(n_ingest=1, n_decode=2)
    ingest_p, decode_p = place_qwen_serve_params(params, pl)
    # full vision tower on the ingest device
    for leaf in jax.tree_util.tree_leaves(ingest_p["vit"]):
        assert leaf.devices() == {pl.ingest_device}
    # decoder only on decode devices; merger present on the decode side
    decode_devs = set(pl.decode_mesh.devices.ravel())
    for leaf in jax.tree_util.tree_leaves(decode_p["llm"]):
        assert leaf.devices() <= decode_devs
        assert pl.ingest_device not in leaf.devices()
    assert "merger" in decode_p["vit"]


def test_disaggregated_answers_match_single_chip(setup, rng):
    """Same params + frames => identical greedy answers whether the decoder
    is TP-sharded on its own devices or co-located with ingest."""
    cfg, params, tok = setup
    pl = make_serve_placement(n_ingest=1, n_decode=2)
    dis = _mk(cfg, params, tok, pl)
    ref = _mk(cfg, params, tok, None)
    frames = [rng.integers(0, 255, (56, 56, 3), np.uint8) for _ in range(6)]
    gen = GenerationConfig(max_new_tokens=6, eos_token_ids=())
    for s in (dis, ref):
        for i in range(0, 6, 2):
            s.ingest_frames(frames[i:i + 2])
        s.block_until_ingested()
    assert dis.state.tem_x.devices() == {pl.ingest_device}
    q = "Describe the scene."
    assert dis.answer(q, gen) == ref.answer(q, gen)
    # streaming answers ride the same handover
    assert "".join(dis.answer_stream(q, gen)) == \
        "".join(ref.answer_stream(q, gen))


def test_answer_concurrent_with_ingest(setup, rng):
    """An answer against a captured snapshot runs on another thread while
    clips keep ingesting; ingest state advances and the answer's snapshot
    semantics are unaffected (the published pair is immutable)."""
    cfg, params, tok = setup
    pl = make_serve_placement(n_ingest=1, n_decode=2)
    sess = _mk(cfg, params, tok, pl)
    frames = [rng.integers(0, 255, (56, 56, 3), np.uint8) for _ in range(12)]
    gen = GenerationConfig(max_new_tokens=4, eos_token_ids=())
    sess.ingest_frames(frames[:2])
    sess.ingest_frames(frames[2:4])
    sess.block_until_ingested()
    snap, nf = sess._published
    baseline = sess.answer_snapshot(snap, nf, "Now?", gen)

    out = {}
    th = threading.Thread(
        target=lambda: out.setdefault(
            "a", sess.answer_snapshot(snap, nf, "Now?", gen)))
    th.start()
    for i in range(4, 12, 2):
        sess.ingest_frames(frames[i:i + 2])
    sess.block_until_ingested()
    th.join(timeout=300)
    assert not th.is_alive()
    assert out["a"] == baseline
    assert int(sess.state.n_frames) == 6      # 12 frames = 6 temporal pairs


def test_session_reset_and_save_load_keep_placement(setup, rng, tmp_path):
    cfg, params, tok = setup
    pl = make_serve_placement(n_ingest=1, n_decode=2)
    sess = _mk(cfg, params, tok, pl)
    frames = [rng.integers(0, 255, (56, 56, 3), np.uint8) for _ in range(4)]
    sess.ingest_frames(frames[:2])
    sess.ingest_frames(frames[2:])
    sess.block_until_ingested()
    p = sess.save_session(str(tmp_path / "sess"))
    sess.reset()
    assert sess.state.tem_x.devices() == {pl.ingest_device}
    sess.load_session(p)
    assert sess.state.tem_x.devices() == {pl.ingest_device}
    assert sess.n_frames == 2
