"""MJPEG-in-mp4 mux/demux roundtrip and load_video wiring
(decord replacement for the no-FFmpeg image; preprocess/mp4.py)."""
import os

import numpy as np
import pytest

from flash_vstream_tpu.preprocess.mp4 import (decode_mjpeg, demux_mjpeg,
                                              mux_mjpeg, parse_mp4)
from flash_vstream_tpu.preprocess.video import load_video


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # blocky frames survive JPEG compression recognizably
    out = []
    for t in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, t % 3] = (60 + 30 * t) % 250
        f[8:24, 8:24] = rng.integers(0, 255, 3, dtype=np.uint8)
        out.append(f)
    return out


def test_mux_demux_roundtrip(tmp_path):
    frames = _frames()
    path = str(tmp_path / "clip.mp4")
    mux_mjpeg(path, frames, fps=2.0)
    track = parse_mp4(path)
    assert track.n_samples == 6
    assert abs(track.fps - 2.0) < 1e-3
    blobs, fps = demux_mjpeg(path)
    assert len(blobs) == 6 and all(b.startswith(b"\xff\xd8") for b in blobs)
    decoded = decode_mjpeg(path)
    assert len(decoded) == 6
    for orig, dec in zip(frames, decoded):
        assert dec.shape == orig.shape
        # JPEG-lossy but close on flat regions
        assert np.abs(dec[30:, 30:].astype(int)
                      - orig[30:, 30:].astype(int)).mean() < 12


def test_decode_mjpeg_subsample(tmp_path):
    path = str(tmp_path / "clip.mp4")
    mux_mjpeg(path, _frames(8), fps=4.0)
    assert len(decode_mjpeg(path, fps=2.0)) == 4
    assert len(decode_mjpeg(path, max_frames=3)) == 3


def test_load_video_mp4(tmp_path):
    path = str(tmp_path / "clip.mp4")
    mux_mjpeg(path, _frames(4), fps=1.0)
    src = load_video(path, max_frames=3)
    assert len(src) == 3
    assert src[0].dtype == np.uint8 and src[0].ndim == 3


def test_load_video_mp4_sibling_frame_dir(tmp_path):
    """Extract-frames-first flow: a sibling dir wins over in-file decode."""
    from PIL import Image
    d = tmp_path / "clip"
    d.mkdir()
    for t in range(5):
        Image.fromarray(np.full((32, 32, 3), t * 40, np.uint8)).save(
            str(d / f"{t:06d}.jpg"))
    (tmp_path / "clip.mp4").write_bytes(b"\x00" * 16)   # not even valid mp4
    src = load_video(str(tmp_path / "clip.mp4"))
    assert len(src) == 5


def test_h264_samples_raise_with_instructions(tmp_path):
    frames = _frames(2)
    path = str(tmp_path / "clip.mp4")
    mux_mjpeg(path, frames, fps=1.0)
    # corrupt the first sample's SOI so it no longer looks like JPEG
    data = bytearray(open(path, "rb").read())
    track = parse_mp4(path)
    off = track.sample_offsets[0]
    data[off:off + 2] = b"\x00\x00"
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="pre-extract frames"):
        demux_mjpeg(path)


def _h264_like_mp4(tmp_path):
    """An mp4 whose samples are not JPEG (stands in for H.264 content)."""
    frames = _frames(2)
    path = str(tmp_path / "clip.mp4")
    mux_mjpeg(path, frames, fps=1.0)
    data = bytearray(open(path, "rb").read())
    track = parse_mp4(path)
    for off in track.sample_offsets:
        data[off:off + 2] = b"\x00\x00"
    open(path, "wb").write(bytes(data))
    return path


def test_load_video_h264_without_ffmpeg_raises(tmp_path, monkeypatch):
    path = _h264_like_mp4(tmp_path)
    import shutil

    from flash_vstream_tpu.preprocess import video as video_mod
    # simulate a host without OpenCV so the fallback chain is exercised
    monkeypatch.setattr(video_mod, "_decode_cv2", lambda *a, **k: None)
    monkeypatch.setattr(shutil, "which", lambda name: None)
    with pytest.raises(RuntimeError, match="no ffmpeg"):
        load_video(path)


def test_load_video_h264_auto_extract(tmp_path, monkeypatch):
    """One-command H.264 flow: with an ffmpeg binary on PATH, load_video
    auto-extracts to the sibling frame dir and serves frames from it (the
    reference decodes any mp4 in-process, cli_video_stream.py:143-146)."""
    import stat
    import sys

    from flash_vstream_tpu.preprocess import video as video_mod
    monkeypatch.setattr(video_mod, "_decode_cv2", lambda *a, **k: None)
    path = _h264_like_mp4(tmp_path)
    # fake ffmpeg: writes 4 jpgs at the output pattern (last argv)
    bindir = tmp_path / "bin"
    bindir.mkdir()
    fake = bindir / "ffmpeg"
    fake.write_text(
        f"#!{sys.executable}\n"
        "import sys\n"
        "import numpy as np\n"
        "from PIL import Image\n"
        "pattern = sys.argv[-1]\n"
        "for i in range(1, 5):\n"
        "    Image.fromarray(np.full((32, 32, 3), i * 30, np.uint8)).save("
        "pattern % i)\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH",
                       f"{bindir}{os.pathsep}" + os.environ.get("PATH", ""))
    src = load_video(path)
    assert len(src) == 4
    # cached: the sibling dir now exists, a second load skips extraction
    assert os.path.isdir(str(tmp_path / "clip"))
    assert len(load_video(path)) == 4


# ---- in-process cv2/FFmpeg decode (decord-parity path) ----

cv2 = pytest.importorskip("cv2")


def _write_cv2_mp4(path, n=10, fps=10.0, hw=(48, 64)):
    h, w = hw
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2 build has no mp4 encoder")
    for i in range(n):
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:, :, 2] = min(i * 25, 255)        # BGR: red ramp
        writer.write(frame)
    writer.release()
    return path


def test_load_video_cv2_in_process(tmp_path):
    """Any FFmpeg-decodable mp4 (no MJPEG, no sibling dir) decodes in-process
    via cv2 — the decord-parity path (reference train/train.py:764-780)."""
    path = _write_cv2_mp4(str(tmp_path / "clip.mp4"), n=10, fps=10.0)
    src = load_video(path, fps=10.0)
    assert len(src) == 10
    f0, f9 = np.asarray(src[0]), np.asarray(src[9])
    assert f0.shape == (48, 64, 3)
    # BGR->RGB swap: the ramp must land in channel 0 (R), not channel 2
    assert int(f9[:, :, 0].mean()) > 150 > int(f9[:, :, 2].mean())


def test_load_video_cv2_fps_subsample(tmp_path):
    path = _write_cv2_mp4(str(tmp_path / "clip10.mp4"), n=10, fps=10.0)
    src = load_video(path, fps=5.0)          # keep every 2nd frame
    assert len(src) == 5
    src = load_video(path, fps=10.0, max_frames=3)
    assert len(src) == 3


def test_probe_hw_len_cv2_mp4(tmp_path):
    from flash_vstream_tpu.preprocess.video import (probe_video_hw,
                                                    probe_video_len)
    path = _write_cv2_mp4(str(tmp_path / "probe.mp4"), n=7, fps=10.0)
    assert probe_video_hw(path) == (48, 64)
    assert probe_video_len(path) == 7
