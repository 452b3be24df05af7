"""Native frame-ingestion library tests (vs PIL reference)."""
import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from flash_vstream_tpu.native import io as vio


@pytest.fixture(scope="module", autouse=True)
def build_native():
    root = os.path.join(os.path.dirname(__file__), "..", "native")
    subprocess.run(["make", "-C", root], check=True, capture_output=True)
    # force re-search after build
    vio._SEARCHED = False
    vio._LIB = None
    yield


def make_jpegs(tmp_path, n=6, hw=(120, 160)):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = rng.integers(0, 255, size=(*hw, 3), dtype=np.uint8)
        p = str(tmp_path / f"f{i:03d}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert vio.native_available(), "libvstream_io.so not found after make"


def test_decode_matches_pil(tmp_path):
    paths = make_jpegs(tmp_path, n=2)
    got = vio.decode_file(paths[0], 56, 56)
    assert got.shape == (56, 56, 3) and got.dtype == np.uint8
    want = np.asarray(Image.open(paths[0]).convert("RGB")
                      .resize((56, 56), Image.BILINEAR)).astype(np.int32)
    # same content up to resampling differences (PIL bilinear is antialiased
    # when downscaling; ours decodes at a DCT-reduced scale first)
    diff = np.abs(got.astype(np.int32) - want).mean()
    assert diff < 30, f"mean abs diff too large: {diff}"


def test_decode_identity_size(tmp_path):
    """No resize: decoded pixels match PIL's decode closely."""
    paths = make_jpegs(tmp_path, n=1, hw=(64, 64))
    got = vio.decode_file(paths[0], 64, 64).astype(np.int32)
    want = np.asarray(Image.open(paths[0]).convert("RGB")).astype(np.int32)
    assert np.abs(got - want).mean() < 2.0


def test_decode_batch(tmp_path):
    paths = make_jpegs(tmp_path, n=4)
    out = vio.decode_batch(paths, 48, 48)
    assert out.shape == (4, 48, 48, 3)
    # frames differ
    assert not np.array_equal(out[0], out[1])


def test_decode_batch_bad_file(tmp_path):
    paths = make_jpegs(tmp_path, n=2)
    bad = str(tmp_path / "missing.jpg")
    out = vio.decode_batch([paths[0], bad, paths[1]], 32, 32)
    assert out.shape == (3, 32, 32, 3)
    assert (out[1] == 0).all()          # failed slot zeroed
    assert not (out[0] == 0).all()


def test_prefetch_loader(tmp_path):
    paths = make_jpegs(tmp_path, n=6)
    loader = vio.PrefetchLoader(paths, 40, 40, prefetch_depth=2)
    frames = list(loader)
    assert len(frames) == 6
    assert all(f.shape == (40, 40, 3) for f in frames)
    # order preserved: frame i matches direct decode
    direct = vio.decode_file(paths[3], 40, 40)
    np.testing.assert_array_equal(frames[3], direct)
