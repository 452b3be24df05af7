"""Qwen LoRA finetune entry: dry-run loss decreases; multi-turn ChatML
supervision golden test; LLaVA features eval worker."""
import json
import os

import numpy as np

from flash_vstream_tpu.core.config import IGNORE_INDEX, tiny_qwen_config
from flash_vstream_tpu.eval import model_video_qa
from flash_vstream_tpu.preprocess.qwen_processor import (
    make_byte_qwen_tokenizer)
from flash_vstream_tpu.train.finetune_flash import (
    make_parser, preprocess_qwen_sample, run_training)


def test_preprocess_qwen_multiturn_golden():
    """2-round ChatML conversation: video block in the first user turn only,
    both answers (+ their <|im_end|>) supervised, headers/user text IGNORE
    (reference finetune_flash.py:190-364)."""
    cfg = tiny_qwen_config()
    tok = make_byte_qwen_tokenizer()
    item = {"conversations": [
        {"from": "human", "value": "<video>\nWhat is shown?"},
        {"from": "gpt", "value": "A red car."},
        {"from": "human", "value": "And after that?"},
        {"from": "gpt", "value": "It drives away."},
    ]}
    grid = (2, 4, 4)   # tiny grid
    ids, labels, span = preprocess_qwen_sample(item, tok, cfg, grid,
                                               max_len=512)
    start, n_vis = span
    pad_tok = tok.special_id("<|video_pad|>")
    # the video block sits exactly at the span, only in the first user turn
    assert (ids[start:start + n_vis] == pad_tok).all()
    assert (ids == pad_tok).sum() == n_vis
    # supervised text = both answers and nothing else
    sup = labels != IGNORE_INDEX
    text = tok.decode([t for t in labels[sup] if 0 <= t < 256])
    assert "A red car." in text and "It drives away." in text
    assert "What is shown?" not in text and "And after that?" not in text
    assert "helpful assistant" not in text
    # each supervised run ends with <|im_end|>
    im_end = tok.special_id("<|im_end|>")
    assert (labels == im_end).sum() == 2
    # ids/labels aligned wherever supervised
    np.testing.assert_array_equal(ids[sup], labels[sup])


def test_qwen_lora_dry_run(tmp_path):
    out = str(tmp_path / "run")
    args = make_parser().parse_args([
        "--dry-run", "--output-dir", out,
        "--max-steps", "5", "--grad-accum", "2",
        "--max-frames", "4", "--frame-bucket", "4",
        "--max-len", "128", "--max-pixels", str(56 * 56),
        "--learning-rate", "5e-3", "--save-steps", "100",
        "--lora-rank", "4", "--lora-alpha", "8",
    ])
    res = run_training(args)
    assert np.isfinite(res["final_loss"])
    assert res["losses"][-1] < res["losses"][0]
    # scalars stream written during the run (§5.1/§5.5)
    import json
    lines = [json.loads(l)
             for l in open(os.path.join(out, "scalars.jsonl"))]
    assert len(lines) == 5
    assert {"step", "loss", "lr", "tokens_per_s"} <= set(lines[0])


def test_qwen_frame_rung_buckets(tmp_path):
    """Default flags (no --frame-bucket/--max-len): mixed-length videos land
    on different frame rungs (short videos skip the max_frames ViT padding)
    and each rung trains through its own compiled step."""
    from flash_vstream_tpu.train.finetune_flash import build_synthetic_dataset
    out = str(tmp_path / "run")
    data_path, video_dir = build_synthetic_dataset(
        str(tmp_path / "synthetic"), n_items=4, n_frames=[2, 2, 8, 8])
    args = make_parser().parse_args([
        "--dry-run", "--output-dir", out,
        "--data-path", data_path, "--video-dir", video_dir,
        "--max-steps", "2", "--grad-accum", "1",
        "--max-frames", "8",
        "--max-pixels", str(56 * 56),
        "--learning-rate", "5e-3", "--save-steps", "100",
        "--lora-rank", "2", "--lora-alpha", "4",
    ])
    res = run_training(args)
    assert all(np.isfinite(l) for l in res["losses"])
    import json
    lines = [json.loads(l)
             for l in open(os.path.join(out, "scalars.jsonl"))]
    # 2-frame videos rung to 2, 8-frame to 8: two distinct buckets trained
    assert len({l["bucket"] for l in lines}) == 2


def test_build_qwen_positions_dynamic_matches_static():
    """The traced-offset rope builder equals the static one at every start
    (bucket items have different question lengths; one compiled step must
    serve all of them)."""
    import jax.numpy as jnp
    from flash_vstream_tpu.models.vstream_qwen import (
        build_qwen_positions, build_qwen_positions_dynamic, mm_grid_index)
    vis = jnp.asarray(mm_grid_index(2, 4, 4), jnp.int32)
    n_vis = vis.shape[1]
    S = 64
    for start in (0, 3, 17, S - n_vis):
        ps, ds = build_qwen_positions(S, start, n_vis, vis)
        pd, dd = build_qwen_positions_dynamic(S, jnp.int32(start), n_vis, vis)
        np.testing.assert_array_equal(np.asarray(ps), np.asarray(pd))
        assert int(ds) == int(dd)


def test_splice_embeds_dynamic():
    import jax.numpy as jnp
    from flash_vstream_tpu.models.vstream_qwen import splice_embeds_dynamic
    emb = jnp.zeros((1, 10, 4))
    vis = jnp.ones((3, 4))
    out = splice_embeds_dynamic(emb, vis, jnp.int32(2))
    assert np.asarray(out[0, 2:5]).sum() == 12
    assert np.asarray(out).sum() == 12


def test_qwen_mixed_image_video_training(tmp_path):
    """Mixed image+video finetuning data: image items land on the rung-0
    bucket (encode_image, no Flash memory), video items on frame rungs; both
    train through their own compiled steps in one run (beyond the reference,
    whose get_rope_index raises NotImplementedError on images)."""
    from flash_vstream_tpu.train.finetune_flash import build_synthetic_dataset
    out = str(tmp_path / "run")
    data_path, video_dir = build_synthetic_dataset(
        str(tmp_path / "synthetic"), n_items=2, n_frames=4, n_images=2)
    args = make_parser().parse_args([
        "--dry-run", "--output-dir", out,
        "--data-path", data_path, "--video-dir", video_dir,
        "--max-steps", "4", "--grad-accum", "1",
        "--max-frames", "4", "--frame-bucket", "4",
        "--max-pixels", str(56 * 56),
        "--learning-rate", "5e-3", "--save-steps", "100",
        "--lora-rank", "2", "--lora-alpha", "4",
    ])
    res = run_training(args)
    assert all(np.isfinite(l) for l in res["losses"])
    lines = [json.loads(l)
             for l in open(os.path.join(out, "scalars.jsonl"))]
    buckets = {l["bucket"] for l in lines}
    assert len(buckets) == 2                 # image bucket + video bucket
    assert any(b.endswith("x0f") for b in buckets)


def test_llava_features_eval_worker(tmp_path):
    """Features-based eval worker: .safetensors features -> predictions."""
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    from safetensors.numpy import save_file
    for v in ("vidA", "vidB"):
        save_file({"feature": rng.normal(size=(5, 64, 32)).astype(np.float32)},
                  str(feat_dir / f"{v}.safetensors"))
    gt = [{"id": i, "video_id": f"vid{'AB'[i % 2]}",
           "question": f"What happens {i}?", "answer": "something"}
          for i in range(3)]
    gt_file = str(tmp_path / "qa.json")
    json.dump(gt, open(gt_file, "w"))

    out_dir = str(tmp_path / "out")
    args = model_video_qa.make_parser().parse_args([
        "--video_dir", str(feat_dir), "--gt_file", gt_file,
        "--output_dir", out_dir, "--dry-run", "--max-new-tokens", "4",
    ])
    f = model_video_qa.run_inference(args)
    preds = [json.loads(l) for l in open(f)]
    assert len(preds) == 3
    assert all("pred" in p for p in preds)
    # resume: re-running adds nothing
    model_video_qa.run_inference(args)
    preds2 = [json.loads(l) for l in open(f)]
    assert len(preds2) == 3
