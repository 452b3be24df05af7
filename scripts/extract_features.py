#!/usr/bin/env python3
"""Precompute CLIP features for videos -> <id>.safetensors {'feature': [T,P,D]}.

The LLaVA-generation training/eval pipelines consume precomputed features
(reference feature-mode, train.py:700-760, model_msvd_qa_featuresloader.py).
This is the extractor that produces them on TPU: frame dirs (or registered
video decoders) -> CLIP ViT encode -> spatially pooled features.
"""
import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", default=None,
                   help="checkpoint with the CLIP tower (omit with --dry-run)")
    p.add_argument("--video_dir", required=True,
                   help="directory of frame dirs (one per video)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--max-frames", type=int, default=1200)
    p.add_argument("--batch-frames", type=int, default=32)
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from flash_vstream_tpu.models import vstream_llava
    from flash_vstream_tpu.preprocess.image import clip_preprocess
    from flash_vstream_tpu.preprocess.video import load_video

    if args.dry_run:
        from flash_vstream_tpu.core.config import tiny_llava_config
        from flash_vstream_tpu.models.vstream_llava import init_llava_params
        cfg = tiny_llava_config()
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
    else:
        from flash_vstream_tpu.core.config import VStreamLLaVAConfig
        from flash_vstream_tpu.weights.convert import load_llava_checkpoint
        cfg = VStreamLLaVAConfig()
        params = load_llava_checkpoint(args.model_path, cfg,
                                       dtype=jnp.bfloat16)

    encode = jax.jit(
        lambda params, imgs: vstream_llava.encode_frames(params, cfg, imgs))

    os.makedirs(args.output_dir, exist_ok=True)
    videos = sorted(os.listdir(args.video_dir))
    bf = args.batch_frames
    for vid in videos:
        out_path = os.path.join(args.output_dir, vid + ".safetensors")
        if os.path.exists(out_path):
            continue
        try:
            src = load_video(os.path.join(args.video_dir, vid), fps=args.fps,
                             max_frames=args.max_frames)
            frames = list(src)
            feats = []
            for i in range(0, len(frames), bf):
                chunk = frames[i:i + bf]
                pad = bf - len(chunk)
                imgs = clip_preprocess(chunk, cfg.vit.image_size)
                if pad:
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad, *imgs.shape[1:]), np.float32)])
                out = np.asarray(encode(params, jnp.asarray(imgs)))
                feats.append(out[:len(chunk)])
            feature = np.concatenate(feats).astype(np.float16)
            save_file({"feature": feature}, out_path)
            print(f"{vid}: {feature.shape}")
        except Exception as e:
            print(f"failed {vid}: {e}")


if __name__ == "__main__":
    main()
