"""Qwen LoRA finetune entry: dry-run loss decreases; LLaVA features eval worker."""
import json
import os

import numpy as np

from flash_vstream_tpu.eval import model_video_qa
from flash_vstream_tpu.train.finetune_flash import make_parser, run_training


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
