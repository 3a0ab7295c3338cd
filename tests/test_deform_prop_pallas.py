"""Parity tests for the Pallas windowed-deformable propagation kernels.

Oracle: ops.propagate.propagate_deformable_windowed (itself parity-tested
against the exact gather and, through the model suite, the reference CUDA
semantics — modulated_deform_im2col_cuda.cuh:24-54,127-194). The Pallas
kernels (ops/pallas/deform_prop.py) must reproduce its forward AND its
jax.vjp gradients for all inputs, including offsets beyond the window
(identical truncation semantics — the clamp regime of training).

Runs in interpreter mode on CPU (same code path as compiled TPU).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.ops.pallas.deform_prop import (
    _deform_op,
    _pure_windowed_planar,
    deform_prop_supported,
    propagate_deformable_pallas,
)
from nlspn_eccv20_tpu.ops.propagate import propagate_deformable_windowed


def _inputs(b, h, w, kernel, scale, seed=0):
    rng = np.random.default_rng(seed)
    k2 = kernel * kernel
    feat = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    off = (rng.standard_normal((b, h, w, 2 * k2)) * scale).astype(np.float32)
    aff = rng.standard_normal((b, h, w, k2)).astype(np.float32)
    return jnp.asarray(feat), jnp.asarray(off), jnp.asarray(aff)


@pytest.mark.parametrize("kernel,radius,scale", [
    (3, 4, 1.5),   # production default window
    (3, 2, 1.0),   # --offset_window 2 recipe
    (3, 4, 6.0),   # offsets ESCAPING the window: truncation must match
    (5, 2, 1.0),   # prop_kernel=5
])
def test_forward_matches_windowed(kernel, radius, scale):
    feat, off, aff = _inputs(2, 12, 16, kernel, scale)
    want = propagate_deformable_windowed(feat, off, aff, kernel=kernel,
                                         radius=radius)
    got = propagate_deformable_pallas(feat, off, aff, kernel=kernel,
                                      radius=radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,radius,scale", [
    (3, 2, 1.0),
    (3, 2, 4.0),   # beyond-window: clamp-regime gradients must match too
    (5, 2, 1.0),
])
def test_gradients_match_windowed_vjp(kernel, radius, scale):
    feat, off, aff = _inputs(1, 10, 12, kernel, scale, seed=3)
    fp = feat[..., 0]
    op = jnp.moveaxis(off, -1, 1)
    ap = jnp.moveaxis(aff, -1, 1)

    mirror = functools.partial(_pure_windowed_planar, kernel=kernel,
                               radius=radius)
    out_ref, vjp_ref = jax.vjp(mirror, fp, op, ap)
    out_pal, vjp_pal = jax.vjp(
        lambda f, o, a: _deform_op(f, o, a, kernel, radius), fp, op, ap)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    g = jnp.asarray(
        np.random.default_rng(7).standard_normal(out_ref.shape),
        jnp.float32)
    for name, a_, b_ in zip(("dfeat", "doff", "daff"),
                            vjp_pal(g), vjp_ref(g)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=name)


def test_grad_through_sum_loss():
    """End-to-end jax.grad through the op (custom VJP plumbing)."""
    feat, off, aff = _inputs(2, 8, 12, 3, 1.0, seed=5)
    fp, op, ap = feat[..., 0], jnp.moveaxis(off, -1, 1), jnp.moveaxis(aff, -1, 1)

    def loss_pal(f, o, a):
        return jnp.sum(_deform_op(f, o, a, 3, 2) ** 2)

    def loss_ref(f, o, a):
        return jnp.sum(_pure_windowed_planar(f, o, a, 3, 2) ** 2)

    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(fp, op, ap)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(fp, op, ap)
    for name, a_, b_ in zip(("dfeat", "doff", "daff"), gp, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_tie_subgradient_at_exact_integer_offsets():
    """Offsets landing on EXACT integers put the tent support edge |t|==1
    on the grid; JAX's maximum splits that tie (subgradient -sign/2). A
    15M-sample fuzz on the real TPU hit one such tie in round 5 — the
    kernel must reproduce the mirror's convention, not just a.e. match."""
    rng = np.random.default_rng(11)
    feat = jnp.asarray(rng.standard_normal((1, 8, 12, 1)), jnp.float32)
    off = jnp.asarray(
        rng.integers(-2, 3, (1, 8, 12, 18)).astype(np.float32))  # integers!
    aff = jnp.asarray(rng.standard_normal((1, 8, 12, 9)), jnp.float32)
    fp, op, ap = feat[..., 0], jnp.moveaxis(off, -1, 1), jnp.moveaxis(aff, -1, 1)

    _, vjp_ref = jax.vjp(
        functools.partial(_pure_windowed_planar, kernel=3, radius=2),
        fp, op, ap)
    _, vjp_pal = jax.vjp(lambda f, o, a: _deform_op(f, o, a, 3, 2),
                         fp, op, ap)
    g = jnp.ones((1, 8, 12), jnp.float32)
    for name, a_, b_ in zip(("dfeat", "doff", "daff"),
                            vjp_pal(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_supported_shapes():
    from nlspn_eccv20_tpu.ops.pallas.deform_prop import (
        _full_cache_ok,
        _width_tiles,
    )

    assert deform_prop_supported(228, 304, 3, 4)   # NYU: full-cache fits
    assert _width_tiles(228, 304, 3, 4) == 1       # untiled
    # KITTI width: the full cache does not fit whole (and the one-level
    # BACKWARD register-spills past VMEM, measured r05) -> served by the
    # width-tiled wrapper over the same full-cache kernels
    assert not _full_cache_ok(240, 1216, 3, 4, n_big=1)
    assert deform_prop_supported(240, 1216, 3, 4)
    assert (_width_tiles(240, 1216, 3, 4) or 0) > 1
    assert not deform_prop_supported(240, 1216, 3, 200)  # absurd window


def test_width_tiled_matches_untiled_and_mirror():
    """The width-tiled wrapper (overlapping rp-halo tiles folded into
    batch, interior-sliced) must be EXACT vs both the untiled op and the
    windowed mirror — forward and gradients (the tiling's vjp performs
    the dP overlap-add)."""
    from nlspn_eccv20_tpu.ops.pallas.deform_prop import _deform_op_tiled

    feat, off, aff = _inputs(2, 10, 24, 3, 1.5, seed=13)
    fp, op, ap = feat[..., 0], jnp.moveaxis(off, -1, 1), jnp.moveaxis(aff, -1, 1)

    def tiled(f, o, a):
        return _deform_op_tiled(f, o, a, 3, 2, n=3)  # 3 tiles of 8 cols

    out_t, vjp_t = jax.vjp(tiled, fp, op, ap)
    out_u, vjp_u = jax.vjp(lambda f, o, a: _deform_op(f, o, a, 3, 2),
                           fp, op, ap)
    out_m, vjp_m = jax.vjp(
        functools.partial(_pure_windowed_planar, kernel=3, radius=2),
        fp, op, ap)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_m),
                               rtol=1e-5, atol=1e-5)
    g = jnp.asarray(np.random.default_rng(3).standard_normal(out_t.shape),
                    jnp.float32)
    for name, a_, b_ in zip(("dfeat", "doff", "daff"), vjp_t(g), vjp_m(g)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_one_level_cache_variant_parity(monkeypatch):
    """KITTI-width shapes fall back to the one-level (lane-shifted) cache
    — force that variant on a small shape and re-check fwd+grad parity."""
    import nlspn_eccv20_tpu.ops.pallas.deform_prop as dp

    monkeypatch.setattr(dp, "_full_cache_ok", lambda *a, **k: False)
    feat, off, aff = _inputs(1, 10, 12, 3, 1.0, seed=9)
    fp, op, ap = feat[..., 0], jnp.moveaxis(off, -1, 1), jnp.moveaxis(aff, -1, 1)
    out_ref, vjp_ref = jax.vjp(
        functools.partial(_pure_windowed_planar, kernel=3, radius=2),
        fp, op, ap)
    out_pal, vjp_pal = jax.vjp(
        lambda f, o, a: dp._deform_op(f, o, a, 3, 2), fp, op, ap)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    g = jnp.asarray(
        np.random.default_rng(2).standard_normal(out_ref.shape), jnp.float32)
    for name, a_, b_ in zip(("dfeat", "doff", "daff"),
                            vjp_pal(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_offset_routing_gate():
    """models/nlspn._offset_uses_pallas: the production routing gate —
    never under spatial sharding, never for offset_window=0 (exact-path
    configs), never for prop_impl='xla'; on CPU backends it resolves
    False (deform_prop_available) so 'auto' stays on the XLA form."""
    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.models.nlspn import _offset_uses_pallas

    base = Config(offset=True, prop_time=3)
    # CPU backend: available() is False regardless of config
    assert not _offset_uses_pallas(base, 64, 96)
    assert not _offset_uses_pallas(base.replace(prop_impl="xla"), 64, 96)
    assert not _offset_uses_pallas(base.replace(offset_window=0), 64, 96)
    assert not _offset_uses_pallas(
        Config(offset=True, num_spatial_shards=2, num_data_shards=2,
               prop_impl="auto"), 64, 96)
    assert not _offset_uses_pallas(Config(offset=False), 64, 96)

    # with a faked TPU backend the default config DOES route pallas,
    # and the spatial-sharding / window-0 gates still override
    import nlspn_eccv20_tpu.models.nlspn as m

    orig = m.__dict__.get("_offset_uses_pallas")
    import nlspn_eccv20_tpu.ops.pallas.deform_prop as dp
    real = dp.deform_prop_available
    dp.deform_prop_available = lambda: True
    try:
        assert _offset_uses_pallas(base, 64, 96)
        assert not _offset_uses_pallas(
            Config(offset=True, num_spatial_shards=2, num_data_shards=2),
            64, 96)
        assert not _offset_uses_pallas(base.replace(offset_window=0), 64, 96)
        # unsupported shape (absurd window) falls back too
        assert not _offset_uses_pallas(
            base.replace(offset_window=200), 2048, 2048)
        # WIDTH-TILED shapes (KITTI-class): pallas for TRAIN only —
        # the tiled kernels lose eval/serving (measured r05)
        assert _offset_uses_pallas(base, 240, 1216, train=True)
        assert not _offset_uses_pallas(base, 240, 1216, train=False)
        # explicit 'pallas' honors the user in eval too
        assert _offset_uses_pallas(base.replace(prop_impl="pallas"),
                                   240, 1216, train=False)
        # untiled shapes route pallas in both modes
        assert _offset_uses_pallas(base, 228, 304, train=False)
    finally:
        dp.deform_prop_available = real
