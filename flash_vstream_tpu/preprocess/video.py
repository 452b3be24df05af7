"""Host-side video frame sources.

The reference decodes mp4 with decord (C++/FFmpeg,
serve/cli_video_stream.py:143-146, train/train.py:764-780) or reads
pre-extracted JPEG frame directories (Qwen pipeline,
scripts/extract_frames.py). Sources here:

- FrameDirSource: %06d.jpg frame directories (the Qwen reference's canonical
  input format)
- ArraySource / SyntheticSource: ndarray or generated frames (tests, bench)
- load_video: pluggable registry + in-process cv2/FFmpeg decode (decord
  parity — any codec FFmpeg handles), with a pure-python MJPEG demuxer and
  an extract-frames fallback chain for hosts without OpenCV.

All sources yield uint8 HWC frames at a target fps.
"""
from __future__ import annotations

import os
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

_VIDEO_DECODERS: dict = {}


def register_video_decoder(ext: str, fn: Callable[[str, float], np.ndarray]):
    _VIDEO_DECODERS[ext.lower()] = fn


class FrameSource:
    """Iterable of uint8 HWC frames with known fps."""

    def __init__(self, frames: Sequence[np.ndarray], fps: float = 1.0):
        self._frames = list(frames)
        self.fps = fps

    def __len__(self):
        return len(self._frames)

    def __getitem__(self, i):
        return self._frames[i]

    def __iter__(self) -> Iterator[np.ndarray]:
        return iter(self._frames)


class SyntheticSource(FrameSource):
    """Deterministic synthetic frames (moving gradient) for tests/bench."""

    def __init__(self, n_frames: int, height: int = 224, width: int = 224,
                 fps: float = 1.0, seed: int = 0):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 255, size=(height, width, 3), dtype=np.uint8)
        frames = []
        for t in range(n_frames):
            f = np.roll(base, shift=3 * t, axis=1).copy()
            f[:, :, 0] = (f[:, :, 0].astype(np.int32) + 5 * t) % 256
            frames.append(f)
        super().__init__(frames, fps)


def load_frame_dir(path: str, fps: float = 1.0, source_fps: float = 1.0,
                   max_frames: Optional[int] = None,
                   resize_hw: Optional[tuple] = None) -> FrameSource:
    """Load a directory of extracted frames (sorted by name), subsampled from
    source_fps to fps. Mirrors the Qwen frame-dir pipeline
    (inference_mcq_vqa.py:244-289). JPEG decode goes through the native
    library (fused decode+resize) when built; PIL otherwise."""
    names = sorted(n for n in os.listdir(path)
                   if n.lower().endswith((".jpg", ".jpeg", ".png")))
    step = max(int(round(source_fps / fps)), 1)
    names = names[::step]
    if max_frames is not None and len(names) > max_frames:
        idx = np.linspace(0, len(names) - 1, max_frames).round().astype(int)
        names = [names[i] for i in idx]
    paths = [os.path.join(path, n) for n in names]

    from ..native import io as vio
    if resize_hw is not None:
        frames = list(vio.decode_batch(paths, *resize_hw)) if paths else []
    elif vio.native_available() and paths and paths[0].lower().endswith(
            (".jpg", ".jpeg")):
        from PIL import Image
        with Image.open(paths[0]) as im:
            w, h = im.size
        frames = list(vio.decode_batch(paths, h, w))
    else:
        from PIL import Image
        frames = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    return FrameSource(frames, fps)


def probe_video_hw(path: str) -> tuple:
    """(height, width) of a video's frames without decoding them all.

    Frame dirs read the first image's header via PIL (no pixel decode);
    registered decoders fall back to decoding one frame."""
    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path)
                       if n.lower().endswith((".jpg", ".jpeg", ".png")))
        if not names:
            raise FileNotFoundError(f"no frames in {path}")
        from PIL import Image
        with Image.open(os.path.join(path, names[0])) as im:
            w, h = im.size
        return h, w
    frame = load_video(path, max_frames=1)[0]
    return tuple(np.asarray(frame).shape[:2])


def probe_video_len(path: str) -> int:
    """Frame count of a video without decoding pixels (frame dirs count
    files; mp4 reads the sample table; else decode)."""
    if os.path.isdir(path):
        return sum(1 for n in os.listdir(path)
                   if n.lower().endswith((".jpg", ".jpeg", ".png")))
    if os.path.splitext(path)[1].lower().lstrip(".") in ("mp4", "mov",
                                                         "m4v"):
        sibling = os.path.splitext(path)[0]
        if os.path.isdir(sibling):
            return probe_video_len(sibling)
        try:
            from .mp4 import parse_mp4
            return parse_mp4(path).n_samples
        except Exception:
            pass
    try:                    # container header via cv2, no pixel decode
        import cv2
        cap = cv2.VideoCapture(path)
        try:
            if cap.isOpened():
                n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                if n > 0:
                    return n
        finally:
            cap.release()
    except ImportError:
        pass
    return len(load_video(path))


def load_video(path: str, fps: float = 1.0,
               max_frames: Optional[int] = None) -> FrameSource:
    """Load frames from a video file or frame directory.

    MP4/MOV resolution order:
    1. a registered decoder for the extension (register_video_decoder),
    2. a sibling frame directory (path minus extension) — the documented
       extract-frames-first flow (scripts/extract_frames.py),
    3. in-process cv2/FFmpeg decode when OpenCV is importable — this is the
       decord-parity path: any codec FFmpeg decodes (H.264/H.265/VP9/...)
       works directly on the file, like the reference's
       decord.VideoReader (cli_video_stream.py:143-146),
    4. the built-in pure-python MJPEG-in-mp4 demuxer (preprocess/mp4.py),
    5. auto-extraction to the sibling dir via an `ffmpeg` binary on PATH
       (one-command H.264 flow; cached for later loads).
    H.264 content with none of the above raises with instructions.
    """
    if os.path.isdir(path):
        return load_frame_dir(path, fps=fps, max_frames=max_frames)
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in _VIDEO_DECODERS:
        frames = _VIDEO_DECODERS[ext](path, fps)
        if max_frames is not None and len(frames) > max_frames:
            idx = np.linspace(0, len(frames) - 1, max_frames).round().astype(int)
            frames = [frames[i] for i in idx]
        return FrameSource(list(frames), fps)
    if ext in ("mp4", "mov", "m4v", "avi", "mkv", "webm"):
        sibling = os.path.splitext(path)[0]
        if os.path.isdir(sibling):
            return load_frame_dir(sibling, fps=fps, max_frames=max_frames)
        frames = _decode_cv2(path, fps=fps, max_frames=max_frames)
        if frames is not None:
            return FrameSource(frames, fps)
        if ext not in ("mp4", "mov", "m4v"):
            raise RuntimeError(
                f"{path}: .{ext} needs OpenCV (cv2) or a registered decoder.")
        from .mp4 import decode_mjpeg
        try:
            frames = decode_mjpeg(path, fps=fps, max_frames=max_frames)
        except ValueError as demux_err:
            # non-JPEG codec (H.264/H.265): one-command flow — auto-extract
            # to the sibling frame dir with ffmpeg when available (the
            # reference decodes any mp4 in-process via decord,
            # cli_video_stream.py:143-146; this host has no codec library,
            # so the extractor binary is the equivalent), else raise with
            # the manual extract-frames-first instructions
            # extract at the canonical 1 fps (the sibling-dir convention,
            # scripts/extract_frames.py) so the cache serves any later fps
            if _extract_frames_ffmpeg(path, sibling, fps=1.0):
                return load_frame_dir(sibling, fps=fps,
                                      max_frames=max_frames)
            raise RuntimeError(
                f"{path}: not MJPEG and no ffmpeg on PATH to auto-extract. "
                f"Pre-extract frames to '{sibling}/' "
                f"(scripts/extract_frames.py) or register_video_decoder()."
            ) from demux_err
        return FrameSource(frames, fps)
    raise RuntimeError(
        f"No decoder registered for .{ext}. This image has no FFmpeg/decord; "
        "pre-extract frames to a directory (scripts/extract_frames.py "
        "equivalent) or register_video_decoder().")


def _decode_cv2(path: str, fps: float = 1.0,
                max_frames: Optional[int] = None) -> Optional[List[np.ndarray]]:
    """In-process video decode via OpenCV's FFmpeg backend.

    Decord-parity path (the reference decodes any mp4 in-process,
    serve/cli_video_stream.py:143-146, train/train.py:764-780): subsample the
    container stream to the target fps with cheap ``grab()`` skips, decoding
    only the kept frames. Returns None when cv2 is absent or cannot open the
    file (unsupported codec/corrupt container) so the caller falls through to
    the MJPEG demuxer / extract-frames chain.
    """
    try:
        import cv2
    except ImportError:
        return None
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    try:
        src_fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
        # headers sometimes lie (0/NaN); treat those as already at target fps
        step = max(int(round(src_fps / fps)), 1) if src_fps > 0 else 1
        frames: List[np.ndarray] = []
        i = 0
        while True:
            if i % step == 0:
                ret, frame = cap.read()        # decode kept frames
                if not ret:
                    break
                frames.append(frame[:, :, ::-1].copy())   # BGR -> RGB
            elif not cap.grab():               # skip without pixel decode
                break
            i += 1
        if not frames:
            return None
        if max_frames is not None and len(frames) > max_frames:
            idx = np.linspace(0, len(frames) - 1,
                              max_frames).round().astype(int)
            frames = [frames[j] for j in idx]
        return frames
    finally:
        cap.release()


def _extract_frames_ffmpeg(path: str, out_dir: str,
                           fps: float = 1.0) -> bool:
    """Extract frames with the ffmpeg binary, if present. The frames land in
    the sibling dir load_video already auto-detects, so the extraction is
    cached for every later load of the same file."""
    import shutil
    import subprocess
    if not shutil.which("ffmpeg"):
        return False
    tmp = out_dir + ".extracting"
    os.makedirs(tmp, exist_ok=True)
    cmd = ["ffmpeg", "-nostdin", "-loglevel", "error", "-i", path,
           "-vf", f"fps={fps}", "-q:v", "2",
           os.path.join(tmp, "%06d.jpg")]
    if subprocess.run(cmd).returncode != 0 or not os.listdir(tmp):
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    os.replace(tmp, out_dir)   # atomic publish: readers never see partials
    return True
