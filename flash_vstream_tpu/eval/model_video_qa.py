"""LLaVA-generation video-QA eval worker (features or frame dirs).

CLI rebuild of Flash-VStream-LLaVA/flash_vstream/eval_video/
model_msvd_qa_featuresloader.py (precomputed .safetensors features) and
model_msvd_qa.py (raw frames at 1 fps):
- per-sample extra system prompt injection (featuresloader L73-75),
- chunking + resume from existing predictions (L125-134),
- near-greedy decode (reference temperature=0.002, L151-152),
- corrupt-feature random resample (L62-68).
"""
from __future__ import annotations

import argparse
import json
import os
import random
from typing import Optional

import numpy as np


def load_features(video_dir: str, video_id: str) -> np.ndarray:
    from safetensors.numpy import load_file
    p = os.path.join(video_dir, video_id + ".safetensors")
    if os.path.exists(p):
        return load_file(p)["feature"]
    p = os.path.join(video_dir, video_id + ".npy")
    if os.path.exists(p):
        return np.load(p)
    raise FileNotFoundError(p)


def build_pipeline(args):
    import jax
    from ..runtime.pipeline import LLaVAPipeline

    if args.dry_run:
        from ..core.config import tiny_llava_config
        from ..models.vstream_llava import init_llava_params
        from ..preprocess.tokenizer import ByteTokenizer
        cfg = tiny_llava_config()
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        return LLaVAPipeline(params, cfg, ByteTokenizer(), max_len=1024)

    import jax.numpy as jnp
    from ..core.config import VStreamLLaVAConfig
    from ..preprocess.tokenizer import load_tokenizer
    from ..weights.convert import load_llava_checkpoint
    cfg = VStreamLLaVAConfig()
    params = load_llava_checkpoint(args.model_path, cfg, dtype=jnp.bfloat16)
    return LLaVAPipeline(params, cfg, load_tokenizer(args.model_path),
                         conv_template=args.conv_mode)


def run_inference(args, pipeline=None) -> str:
    import jax.numpy as jnp
    from ..runtime.generation import GenerationConfig

    questions = json.load(open(args.gt_file))
    questions = questions[args.chunk_idx::args.num_chunks]
    os.makedirs(args.output_dir, exist_ok=True)
    answers_file = os.path.join(args.output_dir, f"{args.output_name}.json")
    if os.path.exists(answers_file):
        with open(answers_file) as f:
            done = {json.loads(l)["id"] for l in f if l.strip()}
        questions = [q for q in questions if q["id"] not in done]

    if pipeline is None:
        pipeline = build_pipeline(args)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           temperature=args.temperature,
                           eos_token_ids=(pipeline.tokenizer.eos_token_id,))

    rng = random.Random(0)
    with open(answers_file, "a") as ans:
        for sample in questions:
            try:
                vid = sample.get("video_id") or sample.get("video_name")
                q = sample["question"]
                if "system" in sample:
                    q = sample["system"] + " " + q
                if args.use_features:
                    feats = None
                    for _ in range(10):
                        try:
                            feats = load_features(args.video_dir, vid)
                            break
                        except Exception as e:
                            print(f"feature load failed ({e}); resampling")
                            sample = rng.choice(questions)
                            vid = sample.get("video_id") or sample.get("video_name")
                    pred = pipeline.answer(None, q, gen=gen,
                                           features=jnp.asarray(
                                               np.asarray(feats, np.float32)))
                else:
                    from ..preprocess.video import load_video
                    src = load_video(os.path.join(args.video_dir, vid),
                                     fps=1.0, max_frames=args.max_frames)
                    pred = pipeline.answer(list(src), q, gen=gen)
                out = dict(sample)
                out["pred"] = pred
                ans.write(json.dumps(out) + "\n")
                ans.flush()
            except Exception as e:
                print(f"error on id={sample.get('id')}: {e}")
                continue
    return answers_file


def make_parser():
    p = argparse.ArgumentParser(description="LLaVA-family video QA eval worker")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--video_dir", required=True)
    p.add_argument("--gt_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_name", default="pred")
    p.add_argument("--conv-mode", default="vicuna_v1")
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--use-features", action="store_true", default=True)
    p.add_argument("--raw-frames", dest="use_features", action="store_false")
    p.add_argument("--max-frames", type=int, default=50)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="reference uses 0.002 (near-greedy); 0 = greedy")
    p.add_argument("--dry-run", action="store_true")
    return p


def main(argv=None):
    run_inference(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
