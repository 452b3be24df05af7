"""Prompt-building paths against REAL `transformers` tokenizers (local
fixtures with the production special-token ids, tests/hf_tok.py) — the
ByteTokenizer stub never runs here.

Covers: build_video_prompt (Qwen ChatML, video span at id 151656),
multi-turn ChatML supervision, and tokenizer_image_token's BOS-offset
logic with a Llama-style tokenizer (preprocess/tokenizer.py:35-39,
reference mm_utils.py:45-64)."""
import dataclasses

import numpy as np

from flash_vstream_tpu.core.config import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                           tiny_llava_config,
                                           tiny_qwen_config)
from flash_vstream_tpu.preprocess.qwen_processor import build_video_prompt
from flash_vstream_tpu.preprocess.tokenizer import tokenizer_image_token
from flash_vstream_tpu.train.data import preprocess_v1
from flash_vstream_tpu.train.finetune_flash import preprocess_qwen_sample

from hf_tok import (QWEN_SPECIALS, make_hf_llama_tokenizer,
                    make_hf_qwen_tokenizer)


def qwen_cfg_real_ids():
    cfg = tiny_qwen_config()
    return dataclasses.replace(
        cfg, image_token_id=QWEN_SPECIALS["<|image_pad|>"],
        video_token_id=QWEN_SPECIALS["<|video_pad|>"],
        vision_start_token_id=QWEN_SPECIALS["<|vision_start|>"])


def test_build_video_prompt_real_qwen_ids():
    cfg = qwen_cfg_real_ids()
    tok = make_hf_qwen_tokenizer()
    ids, (start, n_vis) = build_video_prompt(cfg, tok, "What happens?",
                                             n_video_tokens=7)
    assert n_vis == 7
    assert (ids[start:start + 7] == QWEN_SPECIALS["<|video_pad|>"]).all()
    assert ids[start - 1] == QWEN_SPECIALS["<|vision_start|>"]
    assert ids[start + 7] == QWEN_SPECIALS["<|vision_end|>"]
    # ChatML structure: system + user headers present, ends with assistant
    text = tok.decode(ids, skip_special_tokens=False)
    assert text.startswith("<|im_start|>system\n")
    assert "What happens?" in tok.decode(ids, skip_special_tokens=True)
    assert text.rstrip().endswith("<|im_start|>assistant")


def test_preprocess_qwen_multiturn_real_tokenizer():
    cfg = qwen_cfg_real_ids()
    tok = make_hf_qwen_tokenizer()
    item = {"conversations": [
        {"from": "human", "value": "<video>\nWhat is shown?"},
        {"from": "gpt", "value": "A red car."},
        {"from": "human", "value": "And then?"},
        {"from": "gpt", "value": "It stops."},
    ]}
    ids, labels, (start, n_vis) = preprocess_qwen_sample(
        item, tok, cfg, grid=(2, 4, 4), max_len=512)
    pad = QWEN_SPECIALS["<|video_pad|>"]
    assert (ids[start:start + n_vis] == pad).all()
    assert (ids == pad).sum() == n_vis
    sup = labels != IGNORE_INDEX
    text = tok.decode([int(t) for t in labels[sup]], skip_special_tokens=True)
    assert "A red car." in text and "It stops." in text
    assert "What is shown?" not in text
    assert (labels == QWEN_SPECIALS["<|im_end|>"]).sum() == 2
    np.testing.assert_array_equal(ids[sup], labels[sup])


def test_tokenizer_image_token_bos_offset():
    """The HF Llama tokenizer prepends BOS to every encode() chunk; the
    splicer must keep exactly one BOS and drop the per-chunk duplicates
    (mm_utils.py:45-64)."""
    tok = make_hf_llama_tokenizer()
    assert tok.encode("x")[0] == tok.bos_token_id   # fixture adds BOS
    ids = tokenizer_image_token("USER: <image>\nWhat?", tok)
    assert ids[0] == tok.bos_token_id
    assert (ids == tok.bos_token_id).sum() == 1
    (pos,) = np.where(ids == IMAGE_TOKEN_INDEX)
    assert len(pos) == 1
    left = tok.decode([int(t) for t in ids[1:pos[0]]])
    right = tok.decode([int(t) for t in ids[pos[0] + 1:]])
    assert left == "USER: " and right == "\nWhat?"


def test_preprocess_v1_real_llama_tokenizer():
    tok = make_hf_llama_tokenizer()
    conv = [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "And now?"},
        {"from": "gpt", "value": "A dog."},
    ]
    ids, labels = preprocess_v1(conv, tok)
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    sup = labels != IGNORE_INDEX
    text = tok.decode([int(t) for t in labels[sup] if t >= 0])
    assert "A cat." in text and "A dog." in text
    assert "What is this?" not in text


def test_llava_pipeline_answer_with_real_tokenizer():
    """End-to-end offline QA with the HF Llama tokenizer (tiny model)."""
    import jax
    from flash_vstream_tpu.models.vstream_llava import init_llava_params
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.runtime.pipeline import LLaVAPipeline

    cfg = tiny_llava_config()
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    tok = make_hf_llama_tokenizer()
    pipe = LLaVAPipeline(params, cfg, tok, max_len=512)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (cfg.vit.image_size, cfg.vit.image_size, 3),
                           dtype=np.uint8) for _ in range(4)]
    out = pipe.answer(frames, "What is moving?",
                      GenerationConfig(max_new_tokens=6,
                                       eos_token_ids=(tok.eos_token_id,)))
    assert isinstance(out, str)
