"""Unit tests for the propagation ops.

Mirrors the reference DCN test-harness techniques
(/root/reference/src/model/deformconv/test.py): degeneracy checks (zero
offsets == fixed-local stencil), identity checks (one-hot affinity returns a
shifted input), and numerical comparisons against an independent NumPy
golden implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.ops import (
    insert_center_affinity,
    insert_center_offset,
    normalize_affinity,
    propagate_deformable,
    propagate_local,
)
from nlspn_eccv20_tpu.ops.pallas.local_prop import (
    fused_prop_step,
    propagate_local_pallas,
)


def _np_local_prop(feat, aff, kernel=3):
    """Golden NumPy fixed-local propagation: replicate pad + weighted shifts."""
    b, h, w, _ = feat.shape
    r = kernel // 2
    padded = np.pad(feat[..., 0], ((0, 0), (r, r), (r, r)), mode="edge")
    out = np.zeros((b, h, w), dtype=np.float64)
    idx = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out += padded[:, dy + r:dy + r + h, dx + r:dx + r + w] * aff[..., idx]
            idx += 1
    return out[..., None]


def _np_bilinear(img, y, x):
    """Bilinear sample with zero outside; img (H, W)."""
    h, w = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    ly, lx = y - y0, x - x0
    val = 0.0
    for (yy, wy) in ((y0, 1 - ly), (y0 + 1, ly)):
        for (xx, wx) in ((x0, 1 - lx), (x0 + 1, lx)):
            if 0 <= yy < h and 0 <= xx < w:
                val += wy * wx * img[yy, xx]
    return val


def _np_deform_prop(feat, offset, aff, kernel=3):
    b, h, w, _ = feat.shape
    k2 = kernel * kernel
    r = kernel // 2
    shifts = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    out = np.zeros((b, h, w, 1))
    off = offset.reshape(b, h, w, k2, 2)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                acc = 0.0
                for k, (dy, dx) in enumerate(shifts):
                    sy = y + dy + off[bi, y, x, k, 0]
                    sx = x + dx + off[bi, y, x, k, 1]
                    acc += aff[bi, y, x, k] * _np_bilinear(feat[bi, :, :, 0], sy, sx)
                out[bi, y, x, 0] = acc
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestAffinity:
    def test_center_insert_sums_to_one(self, rng):
        aff = jnp.asarray(rng.normal(size=(2, 4, 5, 8)), jnp.float32)
        out = insert_center_affinity(aff)
        assert out.shape == (2, 4, 5, 9)
        np.testing.assert_allclose(np.sum(out, axis=-1), 1.0, atol=1e-5)
        # center is at index 4; neighbors keep their order
        np.testing.assert_allclose(out[..., :4], aff[..., :4], atol=0)
        np.testing.assert_allclose(out[..., 5:], aff[..., 4:], atol=0)

    def test_offset_insert(self, rng):
        off = jnp.asarray(rng.normal(size=(1, 2, 2, 16)), jnp.float32)
        out = insert_center_offset(off)
        assert out.shape == (1, 2, 2, 18)
        pairs = np.asarray(out).reshape(1, 2, 2, 9, 2)
        np.testing.assert_allclose(pairs[..., 4, :], 0.0)
        np.testing.assert_allclose(pairs[..., :4, :].reshape(1, 2, 2, -1),
                                   off[..., :8])

    def test_tgass_normalization(self, rng):
        aff = jnp.asarray(rng.normal(size=(2, 3, 3, 8)) * 3, jnp.float32)
        gamma = jnp.float32(0.5 * 8)
        out = normalize_affinity(aff, gamma, "TGASS", insert_center=False)
        # golden
        a = np.tanh(np.asarray(aff)) / (0.5 * 8 + 1e-8)
        s = np.abs(a).sum(-1, keepdims=True) + 1e-4
        s = np.maximum(s, 1.0)
        np.testing.assert_allclose(out, a / s, rtol=1e-4, atol=1e-5)

    def test_as_skips_tanh(self, rng):
        aff = jnp.asarray(rng.normal(size=(1, 2, 2, 8)), jnp.float32)
        out = normalize_affinity(aff, jnp.float32(1.0), "AS", insert_center=False)
        a = np.asarray(aff)
        s = np.abs(a).sum(-1, keepdims=True) + 1e-4  # AS: no clamp to 1
        np.testing.assert_allclose(out, a / s, rtol=1e-4, atol=1e-5)

    def test_tc_scales_but_never_divides(self, rng):
        aff = jnp.asarray(rng.normal(size=(1, 2, 2, 8)), jnp.float32)
        out = normalize_affinity(aff, jnp.float32(8.0), "TC", insert_center=False)
        np.testing.assert_allclose(out, np.tanh(np.asarray(aff)) / 8.0,
                                   rtol=1e-4, atol=1e-5)


class TestLocalProp:
    def test_matches_numpy(self, rng):
        feat = jnp.asarray(rng.normal(size=(2, 7, 9, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 7, 9, 9)), jnp.float32)
        out = propagate_local(feat, aff)
        gold = _np_local_prop(np.asarray(feat), np.asarray(aff))
        np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-5)

    def test_identity_affinity(self, rng):
        """One-hot center affinity returns the input exactly."""
        feat = jnp.asarray(rng.normal(size=(1, 6, 6, 1)), jnp.float32)
        aff = jnp.zeros((1, 6, 6, 9)).at[..., 4].set(1.0)
        out = propagate_local(feat, aff)
        np.testing.assert_allclose(out, feat, atol=0)

    def test_shift_affinity(self, rng):
        """One-hot non-center affinity returns the replicate-padded shift."""
        feat = jnp.asarray(rng.normal(size=(1, 5, 5, 1)), jnp.float32)
        aff = jnp.zeros((1, 5, 5, 9)).at[..., 0].set(1.0)  # (-1, -1) neighbor
        out = propagate_local(feat, aff)
        padded = np.pad(np.asarray(feat)[..., 0], ((0, 0), (1, 1), (1, 1)),
                        mode="edge")
        np.testing.assert_allclose(out[..., 0], padded[:, 0:5, 0:5], atol=0)

    def test_kernel5(self, rng):
        feat = jnp.asarray(rng.normal(size=(1, 8, 8, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 8, 8, 25)), jnp.float32)
        out = propagate_local(feat, aff, kernel=5)
        gold = _np_local_prop(np.asarray(feat), np.asarray(aff), kernel=5)
        np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-5)

    def test_grad_flows(self, rng):
        feat = jnp.asarray(rng.normal(size=(1, 4, 4, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 4, 4, 9)), jnp.float32)

        def f(feat, aff):
            return jnp.sum(propagate_local(feat, aff) ** 2)

        gf, ga = jax.grad(f, argnums=(0, 1))(feat, aff)
        # numerical check on a few entries
        eps = 1e-3
        for (b, y, x) in [(0, 0, 0), (0, 2, 3), (0, 3, 1)]:
            fp = f(feat.at[b, y, x, 0].add(eps), aff)
            fm = f(feat.at[b, y, x, 0].add(-eps), aff)
            np.testing.assert_allclose(gf[b, y, x, 0], (fp - fm) / (2 * eps),
                                       rtol=2e-2, atol=2e-3)


class TestDeformableProp:
    def test_zero_offset_degenerates_to_local(self, rng):
        """DCN degeneracy check: zero offsets == fixed-local stencil."""
        feat = jnp.asarray(rng.normal(size=(2, 6, 7, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 6, 7, 9)), jnp.float32)
        off = jnp.zeros((2, 6, 7, 18), jnp.float32)
        out = propagate_deformable(feat, off, aff)
        # NOTE boundary: deformable uses zero-outside sampling; local uses
        # replicate pad. Compare interiors only.
        gold = _np_local_prop(np.asarray(feat), np.asarray(aff))
        np.testing.assert_allclose(out[:, 1:-1, 1:-1], gold[:, 1:-1, 1:-1],
                                   rtol=1e-4, atol=1e-4)

    def test_matches_numpy_random_offsets(self, rng):
        feat = jnp.asarray(rng.normal(size=(1, 5, 6, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 5, 6, 9)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(1, 5, 6, 18)) * 2.0, jnp.float32)
        out = propagate_deformable(feat, off, aff)
        gold = _np_deform_prop(np.asarray(feat), np.asarray(off), np.asarray(aff))
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-4)

    def test_integer_offset_equals_shift(self, rng):
        """Identity-style check: integer offsets sample exact pixels."""
        feat = jnp.asarray(rng.normal(size=(1, 8, 8, 1)), jnp.float32)
        # affinity: one-hot on center neighbor; offset center pair = (+2, +1)
        aff = jnp.zeros((1, 8, 8, 9)).at[..., 4].set(1.0)
        off = jnp.zeros((1, 8, 8, 9, 2)).at[..., 4, 0].set(2.0).at[..., 4, 1].set(1.0)
        out = propagate_deformable(feat, off.reshape(1, 8, 8, 18), aff)
        gold = np.zeros((1, 8, 8))
        f = np.asarray(feat)[..., 0]
        gold[:, :6, :7] = f[:, 2:, 1:]
        np.testing.assert_allclose(out[..., 0], gold, atol=1e-5)

    def test_offset_gradients(self, rng):
        """Numerical gradcheck of coordinate gradients (fp32, loose tol)."""
        feat = jnp.asarray(rng.normal(size=(1, 5, 5, 1)), jnp.float32)
        aff = jnp.asarray(rng.uniform(size=(1, 5, 5, 9)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(1, 5, 5, 18)) * 0.7 + 0.3, jnp.float32)

        def f(off):
            return jnp.sum(propagate_deformable(feat, off, aff) ** 2)

        g = jax.grad(f)(off)
        eps = 1e-2
        for (y, x, c) in [(0, 0, 0), (2, 3, 5), (4, 4, 17), (1, 2, 8)]:
            fp = f(off.at[0, y, x, c].add(eps))
            fm = f(off.at[0, y, x, c].add(-eps))
            num = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(g[0, y, x, c], num, rtol=5e-2, atol=5e-3)



class TestWindowedDeformable:
    """Windowed (shift-and-select) reformulation vs the exact gather."""

    def test_windowed_equals_exact_within_radius(self, rng):
        from nlspn_eccv20_tpu.ops.propagate import (
            propagate_deformable_exact,
            propagate_deformable_windowed,
        )
        feat = jnp.asarray(rng.normal(size=(2, 7, 9, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 7, 9, 9)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(2, 7, 9, 18)), jnp.float32)
        off = jnp.clip(off * 2.0, -4.0, 4.0)
        out_w = propagate_deformable_windowed(feat, off, aff, radius=4)
        out_e = propagate_deformable_exact(feat, off, aff)
        np.testing.assert_allclose(out_w, out_e, rtol=1e-4, atol=1e-5)

    def test_windowed_grads_match_exact(self, rng):
        from nlspn_eccv20_tpu.ops.propagate import (
            propagate_deformable_exact,
            propagate_deformable_windowed,
        )
        feat = jnp.asarray(rng.normal(size=(1, 6, 8, 1)), jnp.float32)
        aff = jnp.asarray(rng.uniform(size=(1, 6, 8, 9)), jnp.float32)
        # keep coordinates away from integer lattice points, where the
        # bilinear derivative is discontinuous and the two formulations
        # may legitimately pick different one-sided values
        off = jnp.asarray(rng.uniform(-0.45, 0.45, size=(1, 6, 8, 18)) + 1.5,
                          jnp.float32)

        def loss(fn):
            return lambda f, o, a: jnp.sum(fn(f, o, a) ** 2)

        g_w = jax.grad(loss(lambda f, o, a: propagate_deformable_windowed(
            f, o, a, radius=4)), argnums=(0, 1, 2))(feat, off, aff)
        g_e = jax.grad(loss(propagate_deformable_exact),
                       argnums=(0, 1, 2))(feat, off, aff)
        for a, b in zip(g_w, g_e):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_scan_variant_matches_unrolled(self, rng):
        """lax.scan-over-neighbors form (HLO-size experiment, VERDICT r3
        item 5): bit-identical forward and gradients vs the unrolled
        windowed form."""
        from nlspn_eccv20_tpu.ops.propagate import (
            propagate_deformable_windowed,
            propagate_deformable_windowed_scan,
        )
        feat = jnp.asarray(rng.normal(size=(2, 7, 9, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 7, 9, 9)), jnp.float32)
        off = jnp.clip(jnp.asarray(rng.normal(size=(2, 7, 9, 18)) * 2.0,
                                   jnp.float32), -4.0, 4.0)
        for r in (2, 4):
            out_u = propagate_deformable_windowed(feat, off, aff, radius=r)
            out_s = propagate_deformable_windowed_scan(feat, off, aff,
                                                       radius=r)
            np.testing.assert_allclose(out_s, out_u, rtol=1e-6, atol=1e-6)

        def loss(fn):
            return lambda f, o, a: jnp.sum(fn(f, o, a, radius=4) ** 2)

        g_u = jax.grad(loss(propagate_deformable_windowed),
                       argnums=(0, 1, 2))(feat, off, aff)
        g_s = jax.grad(loss(propagate_deformable_windowed_scan),
                       argnums=(0, 1, 2))(feat, off, aff)
        for a, b in zip(g_u, g_s):
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)

    def test_union_variant_matches_unrolled(self, rng):
        """Union-of-global-shifts re-association (r04 experiment, measured
        SLOWER standalone — negative result pinned in the docstring):
        must stay numerically identical to the unrolled windowed form."""
        from nlspn_eccv20_tpu.ops.propagate import (
            propagate_deformable_windowed,
            propagate_deformable_windowed_union,
        )
        feat = jnp.asarray(rng.normal(size=(2, 9, 11, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 9, 11, 9)), jnp.float32)
        off = jnp.clip(jnp.asarray(rng.normal(size=(2, 9, 11, 18)) * 2.0,
                                   jnp.float32), -4.0, 4.0)
        for r in (2, 4):
            out_u = propagate_deformable_windowed(feat, off, aff, radius=r)
            out_g = propagate_deformable_windowed_union(feat, off, aff,
                                                        radius=r)
            np.testing.assert_allclose(out_g, out_u, rtol=1e-5, atol=1e-6)

    def test_zero_init_lattice_subgradient_documented(self, rng):
        """ADVICE r2 (medium): at INTEGER sampling points — exactly where
        every --offset run starts, since the offset head is zero-
        initialized — the bilinear tent derivative is discontinuous. The
        windowed formulation takes the symmetric (central) subgradient;
        the exact gather (like the reference CUDA
        modulated_deform_im2col_cuda.cuh:83-125) takes the one-sided
        floor-based one. BOTH are valid subgradients. This test pins the
        contract: outputs and feat/aff gradients agree EXACTLY on the
        lattice; offset gradients differ boundedly (each stays between
        the left and right one-sided derivatives). The 20-step --offset
        trajectory parity (test_reference_parity.py) bounds the real
        training effect: offsets leave the lattice after step 1 and the
        trajectories stay within tolerance.
        """
        from nlspn_eccv20_tpu.ops.propagate import (
            propagate_deformable_exact,
            propagate_deformable_windowed,
        )
        feat = jnp.asarray(rng.normal(size=(1, 6, 8, 1)), jnp.float32)
        aff = jnp.asarray(rng.uniform(size=(1, 6, 8, 9)), jnp.float32)
        off = jnp.zeros((1, 6, 8, 18), jnp.float32)  # zero-init lattice

        def loss(fn):
            return lambda f, o, a: jnp.sum(fn(f, o, a) ** 2)

        g_w = jax.grad(loss(lambda f, o, a: propagate_deformable_windowed(
            f, o, a, radius=4)), argnums=(0, 1, 2))(feat, off, aff)
        g_e = jax.grad(loss(propagate_deformable_exact),
                       argnums=(0, 1, 2))(feat, off, aff)

        # outputs + feat/aff grads: exact agreement (no subgradient choice)
        np.testing.assert_allclose(
            propagate_deformable_windowed(feat, off, aff, radius=4),
            propagate_deformable_exact(feat, off, aff),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g_w[0], g_e[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g_w[2], g_e[2], rtol=1e-4, atol=1e-5)

        # Offset grads: ON the lattice the loss is non-differentiable in
        # every offset component (each bilinear corner's tent weight kinks
        # there), the gradient is set-valued, and each formulation sums
        # per-corner subgradient choices — measured here, they differ by
        # ~55% of the grad norm on this toy case and can even disagree
        # per-component in sign. Pin that the deviation is real AND stays
        # bounded relative to the gradient scale (not hidden):
        dev = float(jnp.linalg.norm(g_w[1] - g_e[1]))
        norm = float(jnp.linalg.norm(g_w[1]))
        assert 1e-6 < dev < 0.8 * norm, (dev, norm)

        # One nudge off the lattice (where every --offset run lives from
        # step 1 on) the ambiguity vanishes: gradients agree to f32
        # tolerance. test_windowed_grads_match_exact covers generic
        # off-lattice offsets; the 20-step --offset trajectory parity
        # (test_reference_parity.py) bounds the end-to-end training
        # effect of the step-0 choice.
        off_eps = off + 0.01
        g_w2 = jax.grad(loss(lambda f, o, a: propagate_deformable_windowed(
            f, o, a, radius=4)), argnums=1)(feat, off_eps, aff)
        g_e2 = jax.grad(loss(propagate_deformable_exact), argnums=1)(
            feat, off_eps, aff)
        np.testing.assert_allclose(g_w2, g_e2, rtol=1e-4, atol=1e-4)

    def test_train_mode_clamps_instead_of_fallback(self, rng):
        """fallback=False (the TRAIN path, r03): offsets beyond the window
        are clamped into it and the windowed form runs unconditionally —
        no lax.cond, no exact-gather branch (whose backward cannot compile
        inside the unrolled train step on TPU; docs/PERFORMANCE.md).
        In-window inputs are bitwise identical to the fallback path."""
        from nlspn_eccv20_tpu.ops.propagate import (
            propagate_deformable_windowed,
        )
        feat = jnp.asarray(rng.normal(size=(1, 6, 8, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 6, 8, 9)), jnp.float32)
        # one escaped offset component
        off = jnp.zeros((1, 6, 8, 18), jnp.float32).at[0, 3, 3, 7].set(6.5)
        out = propagate_deformable(feat, off, aff, radius=4, fallback=False)
        gold = propagate_deformable_windowed(
            feat, jnp.clip(off, -4.0, 4.0), aff, radius=4)
        np.testing.assert_allclose(out, gold, rtol=1e-6, atol=1e-7)
        # in-window: identical to the fallback=True (cond) result
        off_in = jnp.clip(jnp.asarray(rng.normal(size=(1, 6, 8, 18)),
                                      jnp.float32), -3, 3)
        np.testing.assert_allclose(
            propagate_deformable(feat, off_in, aff, radius=4,
                                 fallback=False),
            propagate_deformable(feat, off_in, aff, radius=4),
            rtol=1e-6, atol=1e-7)
        # gradient flows through the clamp for in-window offsets
        g = jax.grad(lambda o: jnp.sum(propagate_deformable(
            feat, o, aff, radius=4, fallback=False) ** 2))(off_in)
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_hybrid_falls_back_beyond_radius(self, rng):
        from nlspn_eccv20_tpu.ops.propagate import propagate_deformable_exact
        feat = jnp.asarray(rng.normal(size=(1, 6, 8, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 6, 8, 9)), jnp.float32)
        off = jnp.zeros((1, 6, 8, 18), jnp.float32).at[0, 3, 3, 7].set(6.5)
        out = propagate_deformable(feat, off, aff, radius=4)
        gold = propagate_deformable_exact(feat, off, aff)
        np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-6)

    def test_hybrid_boundary_offset_exact(self, rng):
        from nlspn_eccv20_tpu.ops.propagate import propagate_deformable_exact
        feat = jnp.asarray(rng.normal(size=(1, 6, 8, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 6, 8, 9)), jnp.float32)
        off = jnp.full((1, 6, 8, 18), 4.0, jnp.float32)  # |off| == radius
        out = propagate_deformable(feat, off, aff, radius=4)
        gold = propagate_deformable_exact(feat, off, aff)
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-5)


class TestPallasLocalProp:
    def test_matches_pure_jax(self, rng):
        feat = jnp.asarray(rng.normal(size=(2, 12, 16, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 12, 16, 9)), jnp.float32)
        out = propagate_local_pallas(feat, aff)
        gold = propagate_local(feat, aff)
        np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-5)

    def test_fused_step_full(self, rng):
        pred = jnp.asarray(rng.normal(size=(2, 10, 12, 1)), jnp.float32)
        conf = jnp.asarray(rng.uniform(size=(2, 10, 12, 1)), jnp.float32)
        dep = jnp.asarray(
            (rng.uniform(size=(2, 10, 12, 1)) > 0.8) * rng.uniform(size=(2, 10, 12, 1)),
            jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 10, 12, 9)), jnp.float32)

        out = fused_prop_step(pred, aff, conf=conf, dep=dep,
                              preserve=True, clip=True)
        gold = propagate_local(pred * conf, aff)
        m = (np.asarray(dep) > 0).astype(np.float32)
        gold = (1 - m) * np.asarray(gold) + m * np.asarray(dep)
        gold = np.maximum(gold, 0.0)
        np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-5)

    def test_fused_step_grads_match_pure(self, rng):
        pred = jnp.asarray(rng.normal(size=(1, 8, 8, 1)), jnp.float32)
        conf = jnp.asarray(rng.uniform(size=(1, 8, 8, 1)), jnp.float32)
        dep = jnp.zeros((1, 8, 8, 1), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 8, 8, 9)), jnp.float32)

        def f_pallas(pred, conf, aff):
            return jnp.sum(fused_prop_step(pred, aff, conf=conf, dep=dep,
                                           preserve=True) ** 2)

        def f_pure(pred, conf, aff):
            out = propagate_local(pred * conf, aff)
            m = (dep > 0).astype(out.dtype)
            return jnp.sum(((1 - m) * out + m * dep) ** 2)

        g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(pred, conf, aff)
        g2 = jax.grad(f_pure, argnums=(0, 1, 2))(pred, conf, aff)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestPallasLoopProp:
    def test_loop_matches_per_step(self, rng):
        from nlspn_eccv20_tpu.ops.pallas.local_prop import propagate_loop_pallas

        pred = jnp.asarray(rng.normal(size=(2, 10, 12, 1)), jnp.float32)
        conf = jnp.asarray(rng.uniform(size=(2, 10, 12, 1)), jnp.float32)
        dep = jnp.asarray(
            (rng.uniform(size=(2, 10, 12, 1)) > 0.8) * rng.uniform(size=(2, 10, 12, 1)),
            jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 10, 12, 9)) * 0.2, jnp.float32)

        out = propagate_loop_pallas(pred, aff, conf=conf, dep=dep, steps=5,
                                    preserve=True, clip=False, pre_blend=True)

        # golden: per-step pure JAX, reference loop semantics
        m = (np.asarray(dep) > 0).astype(np.float32)
        cur = np.asarray((1 - m) * np.asarray(pred) + m * np.asarray(dep))
        for _ in range(5):
            o = propagate_local(jnp.asarray(cur * np.asarray(conf)), aff)
            cur = (1 - m) * np.asarray(o) + m * np.asarray(dep)
        np.testing.assert_allclose(out, cur, rtol=1e-4, atol=1e-5)

    def test_loop_width_tiling_matches_single_tile(self, rng):
        # KITTI-shaped planes exceed VMEM in one block; a tiny budget forces
        # multiple W-tiles, whose halo/contamination logic must be invisible.
        from nlspn_eccv20_tpu.ops.pallas.local_prop import (
            _pick_wtiles,
            propagate_loop_pallas,
        )

        steps, k2 = 4, 9
        # tiles beyond n=1 must be 128-aligned (Mosaic block constraint)
        b, h, w = 1, 8, 512
        budget = (k2 + 7) * h * (w // 4 + 2 * steps) * 4
        n = _pick_wtiles(h, w, k2, steps, budget)
        assert n is not None and n > 1 and (w // n) % 128 == 0

        pred = jnp.asarray(rng.normal(size=(b, h, w, 1)), jnp.float32)
        conf = jnp.asarray(rng.uniform(size=(b, h, w, 1)), jnp.float32)
        dep = jnp.asarray(
            (rng.uniform(size=(b, h, w, 1)) > 0.8) * rng.uniform(size=(b, h, w, 1)),
            jnp.float32)
        aff = jnp.asarray(rng.normal(size=(b, h, w, 9)) * 0.2, jnp.float32)

        kw = dict(conf=conf, dep=dep, steps=steps, preserve=True, clip=True,
                  pre_blend=True)
        single = propagate_loop_pallas(pred, aff, **kw)
        tiled = propagate_loop_pallas(pred, aff, vmem_budget=budget, **kw)
        np.testing.assert_allclose(tiled, single, rtol=1e-5, atol=1e-6)

    def test_loop_grads_match_pure(self, rng):
        # the loop kernel is differentiable: its VJP recomputes through the
        # pure-JAX mirror (_pure_loop_planar)
        from nlspn_eccv20_tpu.ops.pallas.local_prop import (
            _pure_loop_planar,
            propagate_loop_pallas_planar,
        )

        pred = jnp.asarray(rng.normal(size=(2, 10, 12)), jnp.float32)
        conf = jnp.asarray(rng.uniform(size=(2, 10, 12)), jnp.float32)
        dep = jnp.asarray(
            (rng.uniform(size=(2, 10, 12)) > 0.8) * rng.uniform(size=(2, 10, 12)),
            jnp.float32)
        aff = jnp.asarray(rng.normal(size=(2, 9, 10, 12)) * 0.2, jnp.float32)

        def f_pallas(p, c, a):
            return jnp.sum(propagate_loop_pallas_planar(
                p, a, conf=c, dep=dep, steps=4, preserve=True, clip=True,
                pre_blend=True) ** 2)

        def f_pure(p, c, a):
            return jnp.sum(_pure_loop_planar(
                p, a, c, dep, steps=4, kernel=3, preserve=True, clip=True,
                pre_blend=True, has_conf=True, has_dep=True) ** 2)

        # forward parity first
        np.testing.assert_allclose(
            f_pallas(pred, conf, aff), f_pure(pred, conf, aff),
            rtol=1e-4, atol=1e-5)
        g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(pred, conf, aff)
        g2 = jax.grad(f_pure, argnums=(0, 1, 2))(pred, conf, aff)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestDeformableImplDispatch:
    """impl= on the deformable path: every impl resolves to the XLA
    windowed fast path (the experimental Pallas deformable kernel was
    excised to devtools/exp_deform_prop_kernel.py — Mosaic cannot compile
    it at model shapes; negative result pinned there and in
    docs/PERFORMANCE.md)."""

    @pytest.mark.parametrize("impl", ["auto", "xla", "pallas"])
    def test_all_impls_match_exact(self, rng, impl):
        from nlspn_eccv20_tpu.ops.propagate import (
            propagate_deformable_exact,
        )
        feat = jnp.asarray(rng.normal(size=(1, 6, 8, 1)), jnp.float32)
        aff = jnp.asarray(rng.normal(size=(1, 6, 8, 9)), jnp.float32)
        off = jnp.clip(
            jnp.asarray(rng.normal(size=(1, 6, 8, 18)), jnp.float32),
            -4.0, 4.0)
        out = propagate_deformable(feat, off, aff, radius=4, impl=impl)
        gold = propagate_deformable_exact(feat, off, aff)
        np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-5)
