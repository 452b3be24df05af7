"""Qwen-family still-image inputs + interleaved mm rope + training templates.

The reference's Qwen generation has no working image path (get_rope_index
raises NotImplementedError on image tokens, vstream_qwen2vl_model.py:864-866);
this framework implements the standard Qwen2-VL image route (full patch grid,
no Flash memory) and generalizes the rope math to arbitrary image/video
interleavings. preprocess_mpt / preprocess_llama_2 mirror the reference's
train.py:345-575 masking.
"""
import jax
import numpy as np
import pytest

from flash_vstream_tpu.core.config import IGNORE_INDEX, tiny_qwen_config
from flash_vstream_tpu.models.flash_memory import (
    mm_rope_positions,
    qwen_rope_positions,
)
from flash_vstream_tpu.models.vstream_qwen import (
    encode_image,
    image_token_count,
    init_qwen_params,
    mm_grid_index,
    visual_token_count,
)
from flash_vstream_tpu.preprocess.qwen_processor import (
    IMAGE_PAD,
    VIDEO_PAD,
    build_mm_prompt,
    build_video_prompt,
    make_byte_qwen_tokenizer,
)
from flash_vstream_tpu.preprocess.tokenizer import ByteTokenizer
from flash_vstream_tpu.runtime.generation import GenerationConfig
from flash_vstream_tpu.runtime.pipeline import QwenPipeline


@pytest.fixture(scope="module")
def qwen_pipe():
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    return QwenPipeline(params, cfg, make_byte_qwen_tokenizer(), max_len=1024)


# ---------------------------------------------------------------------------
# mm grid index / rope positions
# ---------------------------------------------------------------------------

def test_mm_grid_index_matches_reference_semantics():
    """get_mm_index (model.py:889-898): row-major (t, h//2, w//2)."""
    idx = mm_grid_index(2, 4, 6)            # llm grid 2 x 2 x 3
    assert idx.shape == (3, 12)
    np.testing.assert_array_equal(idx[0], [0] * 6 + [1] * 6)
    np.testing.assert_array_equal(idx[1], [0, 0, 0, 1, 1, 1] * 2)
    np.testing.assert_array_equal(idx[2], [0, 1, 2] * 4)


def test_mm_rope_single_span_equals_qwen_rope():
    vp = np.stack([np.arange(4), np.zeros(4, np.int64), np.ones(4, np.int64)])
    ids = np.arange(20)
    a_pos, a_delta = qwen_rope_positions(ids, (5, 4), vp)
    b_pos, b_delta = mm_rope_positions(ids, [(5, vp)])
    np.testing.assert_array_equal(a_pos, b_pos)
    assert a_delta == b_delta


def test_mm_rope_two_spans_resume_rule():
    """Text after each span resumes at running max+1 (get_rope_index
    st_idx rule); a second span's block offsets by that index."""
    img = mm_grid_index(1, 2, 2)            # 1 token, pos (0,0,0)
    vid = mm_grid_index(2, 2, 2)            # 2 tokens, t = 0,1
    S = 3 + 1 + 2 + 2 + 4                   # txt img txt vid txt
    ids = np.arange(S)
    pos, delta = mm_rope_positions(ids, [(3, img), (6, vid)])
    # pre-text 0..2
    np.testing.assert_array_equal(pos[:, :3], np.tile(np.arange(3), (3, 1)))
    # image block at st_idx=3
    np.testing.assert_array_equal(pos[:, 3], [3, 3, 3])
    # text between: resumes at 3 + max(img)+1 = 4, two tokens -> 4,5
    np.testing.assert_array_equal(pos[:, 4:6], [[4, 5]] * 3)
    # video block offset by st_idx=6: t axis 6,7
    np.testing.assert_array_equal(pos[0, 6:8], [6, 7])
    # tail resumes at 6 + max(vid)+1 = 8
    np.testing.assert_array_equal(pos[:, 8:], [[8, 9, 10, 11]] * 3)
    assert delta == int(pos.max()) + 1 - S


# ---------------------------------------------------------------------------
# processor
# ---------------------------------------------------------------------------

def test_build_mm_prompt_interleaved_spans():
    cfg = tiny_qwen_config()
    tok = make_byte_qwen_tokenizer()
    grid = (2, 4, 4)
    grid_hw = (4, 4)
    ids, spans = build_mm_prompt(
        cfg, tok, "Compare them.",
        [("image", grid_hw), ("video", grid)])
    assert [s[2] for s in spans] == ["image", "video"]
    img_start, img_n, _ = spans[0]
    vid_start, vid_n, _ = spans[1]
    assert img_n == image_token_count(*grid_hw) == 4
    dam, csm = visual_token_count(cfg, *grid)
    assert vid_n == dam + csm
    img_id = tok.special_id(IMAGE_PAD)
    vid_id = tok.special_id(VIDEO_PAD)
    np.testing.assert_array_equal(ids[img_start:img_start + img_n],
                                  [img_id] * img_n)
    np.testing.assert_array_equal(ids[vid_start:vid_start + vid_n],
                                  [vid_id] * vid_n)
    assert img_start + img_n <= vid_start


def test_build_video_prompt_unchanged_via_mm():
    """build_video_prompt delegates to build_mm_prompt — same output."""
    cfg = tiny_qwen_config()
    tok = make_byte_qwen_tokenizer()
    ids, (start, n) = build_video_prompt(cfg, tok, "Q?", grid=(2, 4, 4))
    dam, csm = visual_token_count(cfg, 2, 4, 4)
    assert n == dam + csm
    assert np.all(ids[start:start + n] == tok.special_id(VIDEO_PAD))


# ---------------------------------------------------------------------------
# encode_image + pipeline
# ---------------------------------------------------------------------------

def test_encode_image_shapes():
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    h = w = 8                                 # 112px image
    pd = 3 * 2 * 14 * 14
    patches = np.random.default_rng(0).normal(size=(h * w, pd)).astype(
        np.float32)
    out = jax.jit(lambda p, x: encode_image(p, cfg, x, (h, w)))(
        params, patches)
    assert out.video_embeds.shape == (h * w // 4, cfg.llm.hidden_size)
    assert out.visual_positions.shape == (3, h * w // 4)
    assert np.isfinite(np.asarray(out.video_embeds)).all()
    # standard mm index: t axis all zero for a still image
    assert np.all(np.asarray(out.visual_positions)[0] == 0)


def test_qwen_answer_image(qwen_pipe):
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    gen = GenerationConfig(max_new_tokens=6)
    out = qwen_pipe.answer_image(image, "What is shown?", gen=gen)
    assert isinstance(out, str)
    out2 = qwen_pipe.answer_image(image, "What is shown?", gen=gen)
    assert out == out2                        # deterministic greedy


# ---------------------------------------------------------------------------
# training preprocess: mpt / llama_2
# ---------------------------------------------------------------------------

CONV = [
    {"from": "human", "value": "<image>\nWhat is this?"},
    {"from": "gpt", "value": "A cat."},
    {"from": "human", "value": "And now?"},
    {"from": "gpt", "value": "A dog."},
]


def _supervised_text(ids, labels, tok):
    sup = [int(t) for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    return tok.decode(sup, skip_special_tokens=True)


def test_preprocess_mpt_masks_instructions():
    from flash_vstream_tpu.train.data import preprocess_mpt
    tok = ByteTokenizer()
    ids, labels = preprocess_mpt(CONV, tok)
    assert ids.shape == labels.shape
    sup = _supervised_text(ids, labels, tok)
    assert "A cat." in sup and "A dog." in sup
    assert "What is this?" not in sup and "And now?" not in sup
    # supervised spans copy input ids exactly
    m = labels != IGNORE_INDEX
    np.testing.assert_array_equal(labels[m], ids[m])
    assert m.any() and not m.all()


def test_preprocess_llama_2_masks_instructions():
    from flash_vstream_tpu.train.data import preprocess_llama_2
    tok = ByteTokenizer()
    ids, labels = preprocess_llama_2(CONV, tok)
    sup = _supervised_text(ids, labels, tok)
    assert "A cat." in sup and "A dog." in sup
    assert "What is this?" not in sup and "And now?" not in sup
    m = labels != IGNORE_INDEX
    np.testing.assert_array_equal(labels[m], ids[m])


def test_preprocess_dispatch_covers_all_templates():
    from flash_vstream_tpu.train.data import PREPROCESS_BY_VERSION
    tok = ByteTokenizer()
    for version, fn in PREPROCESS_BY_VERSION.items():
        ids, labels = fn(CONV, tok)
        assert (labels != IGNORE_INDEX).any(), version
