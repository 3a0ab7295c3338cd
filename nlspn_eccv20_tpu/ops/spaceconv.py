"""Space-to-depth reformulation of stride-2 convolutions (op library).

Exact algebraic regrouping of strided small-channel (de)convolutions
(e.g. the GRU-refresh subnets, reference nlspnmodel.py:127-144,365-373):
XLA lowers a stride-2 conv (and, worse, its input-dilated transpose /
gradient) over few-channel tensors onto the MXU with both the channel
dimension padded to 128 lanes and the stride handled by dilation.

STATUS — measured, not wired into the model: isolated-shape timings favor
this reformulation, but a full-model A/B on TPU v5e (devtools/ab_model_time.py,
device-trace medians, bit-repeatable) showed it is a net LOSS in context:
fp32 train step 223.7 vs 219.5 ms, b=1 inference 5.70 vs 5.11 ms, bf16
train ~neutral (148.7 vs 149.1 ms) — the s2d/d2s shuffles and apply-time
kernel reassembly cost more than the dilation-free lowering saves once XLA
fuses the surrounding ops. Kept in the op library (correct, tested in
tests/test_spaceconv.py) for shapes/models where the tradeoff flips.

The reformulation is an exact algebraic regrouping (same multiplies, same
adds per output element):

* stride-2 3x3 conv  ==  dense 2x2 conv over the 4-phase space-to-depth
  input (channels x4), padding ((1,0),(1,0));
* stride-2 3x3 transposed conv (padding 1, output_padding 1)  ==  dense
  2x2 conv emitting 4-phase outputs (channels x4), padding ((0,1),(0,1)),
  followed by depth-to-space;
* stride-2 1x1 conv  ==  1x1 conv of the even-phase slice.

Dense 2x2 convs with 4x the channels tile onto the MXU like any other
conv, and their forward/backward passes are dilation-free. Parameters keep
the reference (3,3,Ci,Co) shapes — the dense kernels are assembled at
apply time (a few KB of shuffling vs. tens of ms of conv time).

Per-dimension tap algebra (kernel index dk in [0,3), phase a in {0,1},
dense-tap t in {0,1}; derivations validated to fp32 round-off in
tests/test_spaceconv.py):

* conv (pad 1, stride 2):  out(y) = sum_dk w[dk] x(2y+dk-1);  writing
  x(2u+a) = xs(u,a) gives taps (t,a,dk) in {(0,1,0),(1,0,1),(1,1,2)} over
  input rows u = y-1+t.
* transposed conv (lhs-dilated form with pre-flipped kernel w, pad (1,2)):
  out(2u) = w[1] x(u);  out(2u+1) = w[0] x(u) + w[2] x(u+1) — taps
  (t,a,dk) in {(0,0,1),(0,1,0),(1,1,2)} over input rows u+t.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# (dense_tap, phase, kernel_index) triples per spatial dimension.
_CONV_TAPS = ((0, 1, 0), (1, 0, 1), (1, 1, 2))
_CONVT_TAPS = ((0, 0, 1), (0, 1, 0), (1, 1, 2))


def _conv_s2d_kernel(kk: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) stride-2 kernel -> dense (2,2,4*Ci,Co)."""
    ci, co = kk.shape[2], kk.shape[3]
    w2 = jnp.zeros((2, 2, 4 * ci, co), kk.dtype)
    for th, a, dkh in _CONV_TAPS:
        for tw, b, dkw in _CONV_TAPS:
            ph = a * 2 + b
            w2 = w2.at[th, tw, ph * ci:(ph + 1) * ci, :].set(kk[dkh, dkw])
    return w2


def _convt_d2s_kernel(kk: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) pre-flipped transposed kernel -> dense (2,2,Ci,4*Co)."""
    ci, co = kk.shape[2], kk.shape[3]
    w2 = jnp.zeros((2, 2, ci, 4 * co), kk.dtype)
    for th, a, dkh in _CONVT_TAPS:
        for tw, b, dkw in _CONVT_TAPS:
            ph = a * 2 + b
            w2 = w2.at[th, tw, :, ph * co:(ph + 1) * co].set(kk[dkh, dkw])
    return w2


def space_to_depth(x: jnp.ndarray, planar: bool = False) -> jnp.ndarray:
    """NHWC (B,2U,2V,C) -> (B,U,V,4C); planar: (B,C,2U,2V) -> same.

    Output channel order is (phase-major, then input channel):
    (a*2+b)*C + c for output pixel parity (a, b).
    """
    if planar:
        n, c, h, w = x.shape
        x = x.reshape(n, c, h // 2, 2, w // 2, 2)
        x = x.transpose(0, 2, 4, 3, 5, 1)
        return x.reshape(n, h // 2, w // 2, 4 * c)
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray, planar: bool = False) -> jnp.ndarray:
    """(B,U,V,4C) -> NHWC (B,2U,2V,C), or planar (B,C,2U,2V)."""
    n, u, v, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, u, v, 2, 2, c)
    if planar:
        y = y.transpose(0, 5, 1, 3, 2, 4)
        return y.reshape(n, c, 2 * u, 2 * v)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * u, 2 * v, c)


def conv3x3_s2(x: jnp.ndarray, kernel: jnp.ndarray,
               planar_in: bool = False) -> jnp.ndarray:
    """Stride-2 3x3 SAME conv via space-to-depth. Even H, W required.

    x: (B,H,W,Ci) or planar (B,Ci,H,W); kernel: (3,3,Ci,Co).
    Returns (B,H/2,W/2,Co). Bit-for-bit-equivalent math to
    ``lax.conv_general_dilated(x, kernel, (2,2), ((1,1),(1,1)))``.
    """
    xs = space_to_depth(x, planar=planar_in)
    w2 = _conv_s2d_kernel(kernel)
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def convt3x3_s2(x: jnp.ndarray, kernel: jnp.ndarray,
                planar_out: bool = False) -> jnp.ndarray:
    """Stride-2 3x3 transposed conv (pad 1, output_padding 1) via d2s.

    x: (B,H,W,Ci); kernel: (3,3,Ci,Co) stored PRE-FLIPPED (the repo's
    ConvTranspose convention). Returns (B,2H,2W,Co) or planar
    (B,Co,2H,2W). Same math as the lhs-dilated formulation in
    models/common.py ConvTranspose.
    """
    w2 = _convt_d2s_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        x, w2, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(y, planar=planar_out)


def conv1x1_s2(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 1x1 conv == 1x1 conv of the even-phase slice."""
    return jax.lax.conv_general_dilated(
        x[:, ::2, ::2, :], kernel, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
