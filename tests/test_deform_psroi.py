"""Deformable PS-RoI pooling tests (constant-map and shift invariants)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.ops.deform_psroi_pooling import deform_psroi_pooling


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_constant_map_pools_to_constant(rng):
    """Pooling a constant feature map returns that constant in every bin."""
    b, h, w = 1, 16, 16
    output_dim, gs, ps = 2, 2, 4
    c = output_dim * gs * gs
    vals = np.arange(output_dim, dtype=np.float32) + 1.0
    data = np.zeros((b, h, w, c), np.float32)
    data[..., :] = np.repeat(vals, gs * gs)[None, None, None, :]
    rois = jnp.asarray([[0, 2, 2, 11, 11]], jnp.float32)
    out = deform_psroi_pooling(jnp.asarray(data), rois, None,
                               spatial_scale=1.0, output_dim=output_dim,
                               group_size=gs, pooled_size=ps)
    assert out.shape == (1, ps, ps, output_dim)
    for d in range(output_dim):
        np.testing.assert_allclose(out[..., d], vals[d], rtol=1e-5)


def test_position_sensitive_selection(rng):
    """Each pooled bin reads its own part's channel block."""
    b, h, w = 1, 12, 12
    output_dim, gs, ps = 1, 2, 2
    c = output_dim * gs * gs  # 4 part channels
    data = np.zeros((b, h, w, c), np.float32)
    for part in range(4):
        data[..., part] = float(part + 1)
    rois = jnp.asarray([[0, 0, 0, 11, 11]], jnp.float32)
    out = np.asarray(deform_psroi_pooling(
        jnp.asarray(data), rois, None, spatial_scale=1.0,
        output_dim=output_dim, group_size=gs, pooled_size=ps))
    # bin (i,j) -> part i*gs+j -> value part+1
    expect = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_allclose(out[0, :, :, 0], expect, rtol=1e-5)


def test_batch_index_routing(rng):
    data = np.zeros((2, 8, 8, 1), np.float32)
    data[0] = 1.0
    data[1] = 5.0
    rois = jnp.asarray([[0, 1, 1, 6, 6], [1, 1, 1, 6, 6]], jnp.float32)
    out = np.asarray(deform_psroi_pooling(
        jnp.asarray(data), rois, None, spatial_scale=1.0, output_dim=1,
        group_size=1, pooled_size=2))
    np.testing.assert_allclose(out[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[1], 5.0, rtol=1e-5)


def test_trans_offsets_shift_samples(rng):
    """A large x-offset via trans moves the sampled region."""
    b, h, w = 1, 16, 16
    data = np.zeros((b, h, w, 1), np.float32)
    data[:, :, 8:, 0] = 7.0  # right half is 7
    rois = jnp.asarray([[0, 0, 4, 5, 10]], jnp.float32)  # left region
    no_off = np.asarray(deform_psroi_pooling(
        jnp.asarray(data), rois, None, spatial_scale=1.0, output_dim=1,
        group_size=1, pooled_size=2))
    trans = np.zeros((1, 2, 2, 2), np.float32)
    trans[..., 1] = 2.0  # +x shift, scaled by trans_std * roi_w
    with_off = np.asarray(deform_psroi_pooling(
        jnp.asarray(data), rois, jnp.asarray(trans), spatial_scale=1.0,
        output_dim=1, group_size=1, pooled_size=2, trans_std=1.0))
    assert no_off.mean() < 1.0
    assert with_off.mean() > no_off.mean()
