"""Module-wrapper tests mirroring the reference degeneracy harness
(/root/reference/src/model/deformconv/test.py:36-110): zero-init Pack
modules must reduce to their plain (non-deformable) counterparts."""

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.ops import (
    DeformConv,
    DeformConvPack,
    DeformRoIPooling,
    DeformRoIPoolingPack,
    ModulatedDeformConv,
    ModulatedDeformConvPack,
)


def _plain_conv(x, w, b, stride=1, pad=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _rand_x(rng, b=2, h=10, w=12, c=6):
    return jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)


def test_deform_conv_pack_equals_plain_conv_at_init():
    rng = np.random.default_rng(0)
    x = _rand_x(rng)
    m = DeformConvPack(features=5)
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    w, b = v["params"]["weight"], v["params"]["bias"]
    np.testing.assert_allclose(out, _plain_conv(x, w, b), rtol=1e-4, atol=1e-5)


def test_mdconv_pack_equals_half_conv_at_init():
    # mask = sigmoid(0) = 0.5 -> output is 0.5 * conv (pre-bias) + bias
    rng = np.random.default_rng(2)
    x = _rand_x(rng)
    m = ModulatedDeformConvPack(features=4)
    v = m.init(jax.random.PRNGKey(3), x)
    out = m.apply(v, x)
    w, b = v["params"]["weight"], v["params"]["bias"]
    expect = 0.5 * _plain_conv(x, w, jnp.zeros_like(b)) + b
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_mdconv_explicit_identity_offsets():
    rng = np.random.default_rng(4)
    x = _rand_x(rng)
    m = ModulatedDeformConv(features=4)
    zeros_off = jnp.zeros(x.shape[:3] + (18,), jnp.float32)
    ones_mask = jnp.ones(x.shape[:3] + (9,), jnp.float32)
    v = m.init(jax.random.PRNGKey(5), x, zeros_off, ones_mask)
    out = m.apply(v, x, zeros_off, ones_mask)
    w, b = v["params"]["weight"], v["params"]["bias"]
    np.testing.assert_allclose(out, _plain_conv(x, w, b), rtol=1e-4, atol=1e-5)


def test_deform_conv_stride_and_groups():
    rng = np.random.default_rng(6)
    x = _rand_x(rng, c=8)
    m = DeformConv(features=6, stride=2, groups=2)
    off = jnp.zeros((2, 5, 6, 18), jnp.float32)
    v = m.init(jax.random.PRNGKey(7), x, off)
    out = m.apply(v, x, off)
    assert out.shape == (2, 5, 6, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_roi_pooling_pack_equals_half_align_at_init():
    rng = np.random.default_rng(8)
    data = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    rois = jnp.asarray([[0, 2, 2, 10, 10], [1, 0, 4, 8, 14]], jnp.float32)

    plain = DeformRoIPooling(spatial_scale=1.0, pooled_size=4, output_dim=8,
                             no_trans=True)
    base = plain(data, rois)
    assert base.shape == (2, 4, 4, 8)

    pack = DeformRoIPoolingPack(spatial_scale=1.0, pooled_size=4,
                                output_dim=8, trans_std=0.1,
                                deform_fc_dim=32)
    v = pack.init(jax.random.PRNGKey(9), data, rois)
    out = pack.apply(v, data, rois)
    np.testing.assert_allclose(out, 0.5 * np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_modules_are_differentiable():
    rng = np.random.default_rng(10)
    x = _rand_x(rng, c=4)
    m = ModulatedDeformConvPack(features=3)
    v = m.init(jax.random.PRNGKey(11), x)

    def loss(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # offset-conv grads must flow (coordinate gradients through bilinear)
    gnorm = float(sum(jnp.sum(jnp.abs(l)) for l in
                      jax.tree.leaves(g["conv_offset_mask"])))
    assert gnorm > 0.0
