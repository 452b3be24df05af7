#!/usr/bin/env python3
"""Extract frames from videos to %06d.jpg directories at a target fps.

Rebuild of Flash-VStream-Qwen/scripts/extract_frames.py. Sources, in
order: an `ffmpeg` binary if present on PATH, the load_video chain
(in-process cv2/FFmpeg decode of any codec, registered decoders, the
pure-python MJPEG demuxer), or already-extracted directories (no-op copy).
"""
import argparse
import os
import shutil
import subprocess
import sys
from multiprocessing.pool import ThreadPool


def extract_one(src: str, dst: str, fps: float) -> bool:
    os.makedirs(dst, exist_ok=True)
    if os.path.isdir(src):
        for i, name in enumerate(sorted(os.listdir(src))):
            shutil.copy(os.path.join(src, name),
                        os.path.join(dst, f"{i:06d}.jpg"))
        return True
    if shutil.which("ffmpeg"):
        cmd = ["ffmpeg", "-nostdin", "-loglevel", "error", "-i", src,
               "-vf", f"fps={fps}", "-q:v", "2",
               os.path.join(dst, "%06d.jpg")]
        return subprocess.run(cmd).returncode == 0
    try:
        from flash_vstream_tpu.preprocess.video import load_video
        from PIL import Image
        frames = load_video(src, fps=fps)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(dst, f"{i:06d}.jpg"),
                                    quality=90)
        return True
    except Exception as e:
        print(f"failed {src}: {e}", file=sys.stderr)
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", required=True)
    p.add_argument("--frame_dir", required=True)
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--workers", type=int, default=16)
    args = p.parse_args()

    videos = sorted(os.listdir(args.video_dir))
    jobs = [(os.path.join(args.video_dir, v),
             os.path.join(args.frame_dir, os.path.splitext(v)[0]), args.fps)
            for v in videos]
    with ThreadPool(args.workers) as pool:
        ok = pool.starmap(extract_one, jobs)
    print(f"extracted {sum(ok)}/{len(jobs)} videos")


if __name__ == "__main__":
    main()
