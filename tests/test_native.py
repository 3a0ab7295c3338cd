"""Native C++ data-loader core tests (skipped when the toolchain is absent)."""

import numpy as np
import pytest
from PIL import Image

from nlspn_eccv20_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.fixture
def depth_png(tmp_path):
    rng = np.random.default_rng(0)
    depth_m = (rng.random((40, 60)) * 80).astype(np.float32)
    raw = (depth_m * 256).astype(np.uint16)
    path = str(tmp_path / "depth.png")
    Image.fromarray(raw).save(path)
    return path, raw.astype(np.float32) / 256.0


@pytest.fixture
def rgb_png(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    path = str(tmp_path / "rgb.png")
    Image.fromarray(img).save(path)
    return path, img


def test_depth_decode_matches_pil(depth_png):
    path, gold = depth_png
    out = native.decode_depth_png(path)
    np.testing.assert_allclose(out, gold, atol=1e-6)


def test_png_dims(depth_png):
    path, gold = depth_png
    assert native.png_dims(path) == gold.shape


def test_rgb_decode_fused_normalize(rgb_png):
    path, img = rgb_png
    out = native.decode_rgb_norm(path, 32, 48)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    gold = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, gold, atol=1e-5)


def test_batch_decode(tmp_path, depth_png):
    path, gold = depth_png
    out = native.decode_depth_batch([path, path, path], 40, 60)
    assert out.shape == (3, 40, 60)
    for i in range(3):
        np.testing.assert_allclose(out[i], gold, atol=1e-6)


def test_batch_decode_bad_path(tmp_path, depth_png):
    path, _ = depth_png
    with pytest.raises(IOError):
        native.decode_depth_batch([path, str(tmp_path / "missing.png")], 40, 60)


def test_sparse_sample_exact_and_deterministic():
    rng = np.random.default_rng(2)
    dep = (rng.random((50, 50)) * 10).astype(np.float32)
    a = native.sparse_sample(dep, 123, seed=42)
    b = native.sparse_sample(dep, 123, seed=42)
    c = native.sparse_sample(dep, 123, seed=43)
    assert (a > 0).sum() == 123
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    m = a > 0
    np.testing.assert_array_equal(a[m], dep[m])


def test_sparse_sample_fewer_valid():
    dep = np.zeros((10, 10), np.float32)
    dep[0, :3] = 1.0
    out = native.sparse_sample(dep, 50, seed=0)
    assert (out > 0).sum() == 3
