"""Serving-surface tests: shape bucketing, padding semantics, compile cache."""

import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.serve import Predictor, _round_up


@pytest.fixture(scope="module")
def predictor():
    import jax

    cfg = Config(prop_time=2, use_GRU=False, use_S2D=False,
                 prop_impl="xla", patch_height=32, patch_width=32).finalize()
    from nlspn_eccv20_tpu.models import get_model

    model = get_model(cfg)
    sample = {"rgb": np.zeros((1, 32, 32, 3), np.float32),
              "dep": np.zeros((1, 32, 32, 1), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    return Predictor(cfg, variables=variables, bucket=32)


def test_round_up():
    assert _round_up(228, 32) == 256
    assert _round_up(256, 32) == 256
    assert _round_up(1, 32) == 32


def test_predict_odd_shape_returns_request_size(predictor):
    rng = np.random.default_rng(0)
    rgb = rng.standard_normal((41, 53, 3)).astype(np.float32)
    dep = np.zeros((41, 53), np.float32)
    dep[5, 7] = 3.0
    out = predictor.predict(rgb, dep)
    assert out.shape == (41, 53)
    assert np.isfinite(out).all() and (out >= 0).all()
    # preserve_input pins the observed pixel despite padding
    assert out[5, 7] == pytest.approx(3.0, rel=1e-5)


def test_uint8_rgb_accepted(predictor):
    rgb = np.zeros((32, 32, 3), np.uint8)
    out = predictor.predict(rgb, np.zeros((32, 32), np.float32))
    assert out.shape == (32, 32)


def test_bucket_cache_reuse(predictor):
    # three sizes in the same (64, 64) bucket -> exactly one cache entry
    for shape in ((40, 40), (33, 63), (64, 64)):
        predictor.predict(np.zeros(shape + (3,), np.float32),
                          np.zeros(shape, np.float32))
    assert (1, 64, 64) in predictor._fns
    buckets_used = {k for k in predictor._fns if k[1] == 64 and k[2] == 64}
    assert len(buckets_used) == 1


def test_batch_mixed_sizes(predictor):
    rgbs = [np.zeros((32, 32, 3), np.float32),
            np.zeros((30, 60, 3), np.float32)]
    deps = [np.zeros((32, 32), np.float32), np.zeros((30, 60), np.float32)]
    outs = predictor.predict_batch(rgbs, deps)
    assert outs[0].shape == (32, 32) and outs[1].shape == (30, 60)


def test_padding_does_not_leak_observations(predictor):
    """Zero-padded depth must not create fake observed pixels: the padded
    region gets no preserve_input pinning, and the valid region's output is
    identical whether the image arrived pre-padded or bucket-padded."""
    rng = np.random.default_rng(1)
    rgb = rng.standard_normal((32, 32, 3)).astype(np.float32)
    dep = (rng.random((32, 32)) > 0.9).astype(np.float32) * 2.0
    out_direct = predictor.predict(rgb, dep)
    # same content inside a 33x33 request (pads to the 64-bucket)
    rgb_big = np.pad(rgb, ((0, 1), (0, 1), (0, 0)), mode="edge")
    dep_big = np.pad(dep, ((0, 1), (0, 1)))
    out_big = predictor.predict(rgb_big, dep_big)[:32, :32]
    # not bitwise (different conv padding context at the seam), but close
    assert np.median(np.abs(out_big - out_direct)) < 0.05
