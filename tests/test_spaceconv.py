"""Space-to-depth conv reformulation (ops/spaceconv.py) vs direct lax.

The s2d forms must match the direct strided / lhs-dilated formulations to
fp32 round-off in both outputs and gradients — they are exact algebraic
regroupings, not approximations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.ops.spaceconv import (
    conv1x1_s2,
    conv3x3_s2,
    convt3x3_s2,
    depth_to_space,
    space_to_depth,
)


def _conv_direct(x, kk):
    return jax.lax.conv_general_dilated(
        x, kk, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _convt_direct(x, kk, planar_out=False):
    return jax.lax.conv_general_dilated(
        x, kk, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO",
                           "NCHW" if planar_out else "NHWC"))


def test_s2d_d2s_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    assert jnp.array_equal(depth_to_space(space_to_depth(x)), x)
    xp = jnp.moveaxis(x, -1, 1)
    s = space_to_depth(xp, planar=True)
    assert jnp.array_equal(s, space_to_depth(x))
    assert jnp.array_equal(depth_to_space(s, planar=True), xp)


@pytest.mark.parametrize("ci,co,h,w", [(1, 16, 12, 16), (16, 8, 10, 20),
                                       (7, 3, 8, 8)])
def test_conv3x3_s2_matches_direct(ci, co, h, w):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, h, w, ci)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.3, jnp.float32)
    ref = _conv_direct(x, kk)
    out = conv3x3_s2(x, kk)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # planar input variant
    out_p = conv3x3_s2(jnp.moveaxis(x, -1, 1), kk, planar_in=True)
    np.testing.assert_allclose(out_p, ref, atol=1e-5)
    # gradients
    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    gd = jax.grad(lambda x, k: jnp.vdot(_conv_direct(x, k), g), (0, 1))(x, kk)
    gs = jax.grad(lambda x, k: jnp.vdot(conv3x3_s2(x, k), g), (0, 1))(x, kk)
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(b, a, atol=1e-4)


@pytest.mark.parametrize("ci,co,h,w,planar", [(16, 8, 10, 20, False),
                                              (5, 7, 9, 11, False),
                                              (16, 8, 6, 10, True)])
def test_convt3x3_s2_matches_direct(ci, co, h, w, planar):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, h, w, ci)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.3, jnp.float32)
    ref = _convt_direct(x, kk, planar_out=planar)
    out = convt3x3_s2(x, kk, planar_out=planar)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)
    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    gd = jax.grad(lambda x, k: jnp.vdot(_convt_direct(x, k, planar), g),
                  (0, 1))(x, kk)
    gs = jax.grad(lambda x, k: jnp.vdot(convt3x3_s2(x, k, planar), g),
                  (0, 1))(x, kk)
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_conv1x1_s2_matches_direct():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 6)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((1, 1, 6, 9)) * 0.3, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kk, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(conv1x1_s2(x, kk), ref, atol=1e-6)


def test_conv_module_odd_dims_fall_back():
    """Odd spatial dims must still work (direct path)."""
    from nlspn_eccv20_tpu.models.common import Conv, ConvTranspose

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 9, 13, 4)), jnp.float32)
    m = Conv(6, kernel=3, stride=2)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 5, 7, 6)
    # transposed conv: odd input dims are fine for d2s (output is 2x input)
    mt = ConvTranspose(6, 3, 2, 1, 1)
    vt = mt.init(jax.random.PRNGKey(0), x)
    yt = mt.apply(vt, x)
    assert yt.shape == (2, 18, 26, 6)
