"""General deformable-conv op tests.

Mirrors the reference DCN test harness patterns
(/root/reference/src/model/deformconv/test.py): zero-offset degeneracy to a
plain convolution, identity-kernel checks, deformable-group behavior, and
numerical gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.ops.deform_conv import (
    deform_conv,
    deformable_im2col,
    modulated_deform_conv,
)


def _plain_conv(x, w, stride=1, padding=0, dilation=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestZeroOffsetDegeneracy:
    """check_dconv_zero_offset / check_mdconv_zero_offset equivalents."""

    @pytest.mark.parametrize("stride,padding,dilation",
                             [(1, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 2)])
    def test_matches_plain_conv(self, rng, stride, padding, dilation):
        b, h, w, c, cout, k = 2, 9, 11, 4, 6, 3
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((k, k, c, cout)) * 0.2, jnp.float32)
        ho = (h + 2 * padding - ((k - 1) * dilation + 1)) // stride + 1
        wo = (w + 2 * padding - ((k - 1) * dilation + 1)) // stride + 1
        off = jnp.zeros((b, ho, wo, k * k * 2), jnp.float32)
        mask = jnp.ones((b, ho, wo, k * k), jnp.float32)

        out = modulated_deform_conv(x, off, mask, wgt, stride=stride,
                                    padding=padding, dilation=dilation)
        gold = _plain_conv(x, wgt, stride, padding, dilation)
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)

    def test_v1_no_mask(self, rng):
        b, h, w, c, cout, k = 1, 8, 8, 3, 5, 3
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((k, k, c, cout)) * 0.2, jnp.float32)
        off = jnp.zeros((b, 8, 8, 18), jnp.float32)
        out = deform_conv(x, off, wgt, padding=1)
        gold = _plain_conv(x, wgt, 1, 1, 1)
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)

    def test_groups(self, rng):
        b, h, w, c, cout, k, g = 1, 6, 6, 4, 8, 3, 2
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((k, k, c // g, cout)) * 0.2,
                          jnp.float32)
        off = jnp.zeros((b, 6, 6, 18), jnp.float32)
        mask = jnp.ones((b, 6, 6, 9), jnp.float32)
        out = modulated_deform_conv(x, off, mask, wgt, padding=1, groups=g)
        gold = _plain_conv(x, wgt, 1, 1, 1, groups=g)
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)


class TestIdentity:
    def test_identity_kernel_zero_offset(self, rng):
        """conv_identify-style check (reference test.py:22-34,112-181)."""
        b, h, w, c, k = 1, 7, 7, 3, 3
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        wgt = np.zeros((k, k, c, c), np.float32)
        for i in range(c):
            wgt[1, 1, i, i] = 1.0  # center tap, per-channel identity
        off = jnp.zeros((b, h, w, 18), jnp.float32)
        mask = jnp.ones((b, h, w, 9), jnp.float32)
        out = modulated_deform_conv(x, off, mask, jnp.asarray(wgt), padding=1)
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_integer_offset_shifts(self, rng):
        """Integer offsets sample exact pixels through the identity kernel."""
        b, h, w, c = 1, 8, 8, 2
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        wgt = np.zeros((3, 3, c, c), np.float32)
        for i in range(c):
            wgt[1, 1, i, i] = 1.0
        off = np.zeros((b, h, w, 9, 2), np.float32)
        off[..., 4, 1] = 1.0  # center tap shifted +1 in x
        mask = jnp.ones((b, h, w, 9), jnp.float32)
        out = modulated_deform_conv(x, jnp.asarray(off.reshape(b, h, w, 18)),
                                    mask, jnp.asarray(wgt), padding=1)
        gold = np.zeros_like(np.asarray(x))
        gold[:, :, :-1] = np.asarray(x)[:, :, 1:]
        np.testing.assert_allclose(out, gold, atol=1e-5)

    def test_mask_scales_output(self, rng):
        b, h, w, c = 1, 5, 5, 1
        x = jnp.ones((b, h, w, c), jnp.float32)
        wgt = np.zeros((3, 3, 1, 1), np.float32)
        wgt[1, 1, 0, 0] = 1.0
        off = jnp.zeros((b, h, w, 18), jnp.float32)
        mask = jnp.full((b, h, w, 9), 0.5, jnp.float32)
        out = modulated_deform_conv(x, off, mask, jnp.asarray(wgt), padding=1)
        np.testing.assert_allclose(out, 0.5, atol=1e-6)


class TestDeformableGroups:
    def test_per_group_offsets(self, rng):
        """dg=2: each channel half follows its own offset field."""
        b, h, w, c = 1, 8, 8, 4
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        # identity weight, center tap only
        wgt = np.zeros((3, 3, c, c), np.float32)
        for i in range(c):
            wgt[1, 1, i, i] = 1.0
        off = np.zeros((b, h, w, 2, 9, 2), np.float32)
        off[:, :, :, 1, 4, 0] = 1.0  # group 1 center tap shifted +1 in y
        mask = jnp.ones((b, h, w, 18), jnp.float32)
        out = modulated_deform_conv(
            x, jnp.asarray(off.reshape(b, h, w, 36)), mask, jnp.asarray(wgt),
            padding=1, deformable_groups=2)
        xa = np.asarray(x)
        np.testing.assert_allclose(out[..., :2], xa[..., :2], atol=1e-5)
        gold = np.zeros((b, h, w, 2), np.float32)
        gold[:, :-1] = xa[:, 1:, :, 2:]
        np.testing.assert_allclose(out[..., 2:], gold, atol=1e-5)


class TestGradients:
    def test_gradcheck(self, rng):
        """fp32 numerical gradcheck on x, offset, mask, weight."""
        b, h, w, c, cout = 1, 5, 5, 2, 3
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.3, jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, 5, 5, 18)) * 0.6 + 0.25,
                          jnp.float32)
        mask = jnp.asarray(rng.uniform(0.2, 1.0, (b, 5, 5, 9)), jnp.float32)

        def f(x, off, mask, wgt):
            return jnp.sum(
                modulated_deform_conv(x, off, mask, wgt, padding=1) ** 2)

        grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
        eps = 1e-2
        checks = [(0, x, (0, 2, 3, 1)), (1, off, (0, 1, 2, 7)),
                  (2, mask, (0, 3, 2, 4)), (3, wgt, (1, 1, 0, 2))]
        args = [x, off, mask, wgt]
        for gi, arr, idx in checks:
            ap = args.copy()
            ap[gi] = arr.at[idx].add(eps)
            am = args.copy()
            am[gi] = arr.at[idx].add(-eps)
            num = (f(*ap) - f(*am)) / (2 * eps)
            np.testing.assert_allclose(grads[gi][idx], num, rtol=6e-2,
                                       atol=6e-3)

    def test_input_grad_deterministic(self, rng):
        """Unlike the CUDA atomicAdd backward, ours is bitwise deterministic."""
        b, h, w, c = 2, 6, 6, 2
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, c, 2)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, 6, 6, 18)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(b, 6, 6, 9)), jnp.float32)

        def f(x):
            return jnp.sum(modulated_deform_conv(x, off, mask, wgt, padding=1))

        g1 = jax.grad(f)(x)
        g2 = jax.grad(f)(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
