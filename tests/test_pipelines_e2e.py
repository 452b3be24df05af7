"""End-to-end offline QA through both pipelines with tiny random-init models.

This is the framework analog of BASELINE.json config #1 (LLaVA offline QA)
and #2 (Qwen MCQ) at test scale: synthetic frames -> encode -> memory ->
splice -> KV-cached decode -> text. Weightless, so we assert mechanics
(shapes, determinism, token flow), not answer quality.
"""
import jax
import numpy as np
import pytest

from flash_vstream_tpu.core.config import tiny_llava_config, tiny_qwen_config
from flash_vstream_tpu.models.vstream_llava import init_llava_params
from flash_vstream_tpu.models.vstream_qwen import init_qwen_params, visual_token_count
from flash_vstream_tpu.preprocess.qwen_processor import (
    build_video_prompt,
    make_byte_qwen_tokenizer,
    visual_position_ids,
)
from flash_vstream_tpu.preprocess.tokenizer import ByteTokenizer
from flash_vstream_tpu.preprocess.video import SyntheticSource
from flash_vstream_tpu.runtime.generation import GenerationConfig
from flash_vstream_tpu.runtime.pipeline import LLaVAPipeline, QwenPipeline


@pytest.fixture(scope="module")
def llava_pipe():
    cfg = tiny_llava_config()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    return LLaVAPipeline(params, cfg, ByteTokenizer(), max_len=1024)


@pytest.fixture(scope="module")
def qwen_pipe():
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    return QwenPipeline(params, cfg, make_byte_qwen_tokenizer(), max_len=1024)


def test_llava_offline_qa(llava_pipe):
    frames = list(SyntheticSource(6, 112, 112))
    gen = GenerationConfig(max_new_tokens=8)
    out = llava_pipe.answer(frames, "What is happening?", gen=gen)
    assert isinstance(out, str)
    # deterministic greedy decode
    out2 = llava_pipe.answer(frames, "What is happening?", gen=gen)
    assert out == out2


def test_llava_video_length_independence(llava_pipe):
    """Different frame counts flow through the same pipeline."""
    gen = GenerationConfig(max_new_tokens=4)
    for n in (1, 3, 9):
        frames = list(SyntheticSource(n, 112, 112))
        out = llava_pipe.answer(frames, "Describe.", gen=gen)
        assert isinstance(out, str)


def test_qwen_prompt_token_count():
    cfg = tiny_qwen_config()
    tok = make_byte_qwen_tokenizer()
    grid = (3, 4, 4)
    dam, csm = visual_token_count(cfg, *grid)
    assert (dam, csm) == (8, 3)
    ids, span = build_video_prompt(cfg, tok, "Q?", grid=grid)
    start, n = span
    assert n == dam + csm
    assert (ids[start:start + n] == cfg.video_token_id).all()
    vpi = visual_position_ids(ids, span)
    assert (vpi[start:start + n] == np.arange(n)).all()
    assert (vpi[:start] == -1).all()


def test_qwen_offline_qa(qwen_pipe):
    frames = list(SyntheticSource(6, 56, 56))
    gen = GenerationConfig(max_new_tokens=8)
    out = qwen_pipe.answer(frames, "What color is the object?", gen=gen)
    assert isinstance(out, str)
    out2 = qwen_pipe.answer(frames, "What color is the object?", gen=gen)
    assert out == out2


def test_qwen_long_video_compression(qwen_pipe):
    """More frames than the memory budget: token count stays bounded."""
    cfg = qwen_pipe.cfg
    frames = list(SyntheticSource(20, 56, 56))   # t=10 > csm 4 > dam 2
    gen = GenerationConfig(max_new_tokens=4)
    out = qwen_pipe.answer(frames, "Summarize.", gen=gen)
    assert isinstance(out, str)
    dam, csm = visual_token_count(cfg, 10, 4, 4)
    assert dam == 2 * 4 and csm == 4  # bounded by flash memory config
