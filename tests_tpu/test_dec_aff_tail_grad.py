"""On-TPU gradient oracle for the fused decode_aff tail kernel.

History (round 3 correction of a round-2 claim): round 2's docs stated the
XLA VJP of deconv2(relu(deconv1(x))) — the decode_aff tail, reference
nlspnmodel.py:140-144 — was "miscompiled >100%" on TPU and that the Pallas
kernel (ops/pallas/dec_aff_tail.py) fixed it. Re-measured on device with a
validated float64 ANALYTIC oracle (pure NumPy; itself checked against the
CPU XLA VJP to ~1e-6 in this file's sibling CPU run), the real story is:

  * the gradient of this composition at random inputs is ILL-CONDITIONED
    at ReLU boundaries: ~0.07% of the deconv1 pre-activations sit within
    ~8e-3 of zero, so their sign — hence the ReLU subgradient mask —
    differs between f32 MXU arithmetic and float64 (measured 186/277k
    flipped elements at the NYU tail geometry);
  * against the f64-mask oracle BOTH the TPU XLA composition gradient and
    the Pallas kernel gradient deviate (up to ~19% max-rel on dL/dx) —
    and by the SAME amount: the two backends agree with each other to
    ~1e-6;
  * against the oracle evaluated with the TPU forward's OWN mask
    (subgradient-consistent comparison) both collapse to <4e-3 max-rel.

Conclusion: no miscompile on this stack; every backend returns a valid
subgradient. This file pins exactly that, so a FUTURE stack regression
(a genuinely wrong gradient, which would NOT collapse under the
mask-consistent oracle) turns the suite red.

The fused kernel's justification is performance (docs/PERFORMANCE.md:
+21% fp32 train step; the 8/16-channel deconvs pad 8-16x in XLA layouts),
not correctness.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nlspn_eccv20_tpu.ops.pallas.dec_aff_tail as dat

# NYU decode_aff tail geometry: 1/4-res grid 57x76, C=GRU chain width,
# M=16, K=8 (see models/nlspn.DecodeAff and docs/PERFORMANCE.md).
B, HG, WG, C, M, K = 1, 57, 76, 64, 16, 8


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, HG, WG, C)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, C, M)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((M,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, M, K)) * 0.2).astype(np.float32)
    b2 = (rng.standard_normal((K,)) * 0.1).astype(np.float32)
    g = rng.standard_normal((B, K, 4 * HG, 4 * WG)).astype(np.float32)
    return x, w1, b1, w2, b2, g


def _scalar_loss(fn, x, w1, b1, w2, b2, g):
    return jnp.vdot(fn(x, w1, b1, w2, b2), g)


# ---------------------------------------------------------------------------
# NumPy float64 analytic oracle. Deconv semantics are exactly
# models/common.ConvTranspose (k3, s2, p1, op1, pre-flipped HWIO storage ==
# lax correlation with lhs_dilation=2, padding ((1,2),(1,2))).
# ---------------------------------------------------------------------------

def _deconv_np(x, w, b):
    bsz, h, wd, c = x.shape
    m = w.shape[3]
    xd = np.zeros((bsz, 2 * h + 2, 2 * wd + 2, c), np.float64)
    xd[:, 1:2 * h:2, 1:2 * wd:2] = x
    out = np.zeros((bsz, 2 * h, 2 * wd, m), np.float64)
    for dy in range(3):
        for dx in range(3):
            out += np.einsum("bhwc,cm->bhwm",
                             xd[:, dy:dy + 2 * h, dx:dx + 2 * wd],
                             np.asarray(w[dy, dx], np.float64))
    return out + np.asarray(b, np.float64)


def _deconv_bwd_np(x, w, dy):
    bsz, h, wd, c = x.shape
    m = w.shape[3]
    xd = np.zeros((bsz, 2 * h + 2, 2 * wd + 2, c), np.float64)
    xd[:, 1:2 * h:2, 1:2 * wd:2] = x
    dxd = np.zeros_like(xd)
    dw = np.zeros((3, 3, c, m), np.float64)
    for dy_ in range(3):
        for dx_ in range(3):
            patch = xd[:, dy_:dy_ + 2 * h, dx_:dx_ + 2 * wd]
            dw[dy_, dx_] = np.einsum("bhwc,bhwm->cm", patch, dy)
            dxd[:, dy_:dy_ + 2 * h, dx_:dx_ + 2 * wd] += np.einsum(
                "bhwm,cm->bhwc", dy, np.asarray(w[dy_, dx_], np.float64))
    dx = dxd[:, 1:2 * h:2, 1:2 * wd:2].copy()
    db = dy.sum(axis=(0, 1, 2))
    return dx, dw, db


def _analytic_np(x, w1, b1, w2, b2, g, mask=None):
    """Exact f64 gradients of vdot(tail(x,...), g). ``mask`` overrides the
    ReLU subgradient mask (pre > 0 in f64 when None) — passing the device
    forward's mask makes the comparison subgradient-consistent."""
    x64 = np.asarray(x, np.float64)
    pre = _deconv_np(x64, w1, b1)
    m = (pre > 0).astype(np.float64) if mask is None else mask
    y1 = pre * m
    dy2 = np.moveaxis(np.asarray(g, np.float64), 1, -1)
    dy1, dw2, db2 = _deconv_bwd_np(y1, np.asarray(w2, np.float64), dy2)
    dy1 = dy1 * m
    dx, dw1, db1 = _deconv_bwd_np(x64, np.asarray(w1, np.float64), dy1)
    return dx, dw1, db1, dw2, db2


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-8))


NAMES = ["x", "w1", "b1", "w2", "b2"]


@pytest.fixture(scope="module")
def measured():
    if not dat._use_pallas():
        pytest.skip("Pallas dec_aff_tail not available on this backend")
    x, w1, b1, w2, b2, g = _inputs()
    args = (x, w1, b1, w2, b2)
    jargs = tuple(jnp.asarray(a) for a in args)
    jg = jnp.asarray(g)

    # device forward pre-activation -> the device's ReLU mask
    pre_dev = np.asarray(jax.jit(
        lambda x_, w_, b_: jax.lax.conv_general_dilated(
            x_, w_, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_
    )(jargs[0], jargs[1], jargs[2]))
    pre_f64 = _deconv_np(np.asarray(x, np.float64), w1, b1)
    mask_dev = (pre_dev > 0).astype(np.float64)

    gx = jax.grad(jax.jit(functools.partial(
        _scalar_loss, dat.decode_aff_tail_reference)),
        argnums=(0, 1, 2, 3, 4))(*jargs, jg)
    gp = jax.grad(jax.jit(functools.partial(
        _scalar_loss, dat.decode_aff_tail)),
        argnums=(0, 1, 2, 3, 4))(*jargs, jg)

    oracle_dev_mask = _analytic_np(*args, g, mask=mask_dev)
    return {
        "gx": gx, "gp": gp,
        "oracle": oracle_dev_mask,
        "mask_dev": mask_dev, "pre_f64": pre_f64,
    }


@pytest.mark.parametrize("wrt", range(5), ids=NAMES)
def test_pallas_grads_match_f64_oracle(measured, wrt):
    """Pallas kernel VJP vs the mask-consistent f64 analytic oracle.
    Measured headroom ~5x (3.3e-3 observed vs 2e-2 bound)."""
    err = _rel(measured["gp"][wrt], measured["oracle"][wrt])
    assert err < 2e-2, f"pallas {NAMES[wrt]} grad vs f64 oracle: {err:.3e}"


@pytest.mark.parametrize("wrt", range(5), ids=NAMES)
def test_xla_grads_match_f64_oracle(measured, wrt):
    """TPU XLA composition VJP vs the same oracle — the round-2
    'miscompile' does not exist on this stack; a real one would fail
    here (mask-consistency cannot hide a wrong gradient)."""
    err = _rel(measured["gx"][wrt], measured["oracle"][wrt])
    assert err < 2e-2, f"xla {NAMES[wrt]} grad vs f64 oracle: {err:.3e}"


@pytest.mark.parametrize("wrt", range(5), ids=NAMES)
def test_pallas_and_xla_agree(measured, wrt):
    """The two independent backward implementations must agree tightly
    (measured ~1e-6 for x/w1/b1/w2); catches kernel regressions at full
    f32 precision. b2 = a single f32 reduction over all 277k output
    pixels, where the kernel's tile-sequential accumulation order differs
    from XLA's tree reduction (measured 1.7e-3) — bound scaled for it."""
    tol = 5e-3 if NAMES[wrt] == "b2" else 1e-4
    err = _rel(measured["gp"][wrt], measured["gx"][wrt])
    assert err < tol, f"pallas vs xla {NAMES[wrt]} grad: {err:.3e}"


def test_boundary_flips_are_small_and_rare(measured):
    """The documented ill-conditioning stays in its measured regime: mask
    flips confined to near-zero pre-activations and <1% of elements.
    If this grows, gradient noise between backends grows with it."""
    mask_f64 = (measured["pre_f64"] > 0)
    flipped = mask_f64 != (measured["mask_dev"] > 0.5)
    frac = flipped.mean()
    assert frac < 1e-2, f"mask flip fraction {frac:.2%}"
    if flipped.any():
        worst = float(np.max(np.abs(measured["pre_f64"][flipped])))
        scale = float(np.max(np.abs(measured["pre_f64"])))
        assert worst / scale < 1e-2, (worst, scale)
