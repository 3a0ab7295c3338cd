"""General deformable convolution ops (DCN v1/v2), TPU-native.

Op-library parity with the reference's CUDA extension
(/root/reference/src/model/deformconv/): ``modulated_deform_conv`` (DCNv2,
modulated_deform_conv_cuda.cu:19-121 + modulated_deform_im2col_cuda.cuh) and
``deform_conv`` (DCNv1, deform_conv_cuda.cu). NLSPN's propagation only needs
the degenerate all-ones-weight case (ops/propagate.propagate_deformable);
these general forms cover the rest of the op surface.

TPU-first design: instead of the CUDA im2col kernel + per-group at::addmm
loop, the deformable im2col is a batched bilinear GATHER (4 corner gathers
with validity masks == the CUDA zero-outside semantics,
mdmcn_im2col_bilinear, cuh:24-54) expressed in pure JAX, and the contraction
is one big ``dot_general`` that XLA places on the MXU. The backward is
JAX autodiff: input gradients become deterministic scatter-adds (the CUDA
path uses non-deterministic atomicAdd, cuh:249) and coordinate gradients
flow through the bilinear weights exactly like ``mdmcn_get_coordinate_weight``
(cuh:83-125).

Layouts (NHWC):
  x:      (B, H, W, C)
  offset: (B, Ho, Wo, dg * K2 * 2)   per-position (dy, dx) pairs, ordered
          [g0k0(dy,dx), g0k1(dy,dx), ...] matching the reference's channel
          order (2 * dg * K2 planes as NCHW -> interleaved pairs here).
  mask:   (B, Ho, Wo, dg * K2)        DCNv2 modulation (None for v1).
  weight: (kh, kw, C // groups, Cout) HWIO.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _out_size(size: int, k: int, stride: int, pad: int, dilation: int) -> int:
    eff = (k - 1) * dilation + 1
    return (size + 2 * pad - eff) // stride + 1


def deformable_im2col(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    kernel: Tuple[int, int],
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Bilinear-gather im2col. Returns columns (B, Ho, Wo, K2, C).

    Sampling location for output (ho, wo), kernel tap (ky, kx), def-group g:
        y = ho * stride - pad + ky * dilation + off_y[g, k]
        x = wo * stride - pad + kx * dilation + off_x[g, k]
    Samples outside the image contribute zero.
    """
    b, h, w, c = x.shape
    kh, kw = kernel
    k2 = kh * kw
    dg = deformable_groups
    assert c % dg == 0, "channels must divide deformable_groups"
    cg = c // dg
    ho = _out_size(h, kh, stride, padding, dilation)
    wo = _out_size(w, kw, stride, padding, dilation)
    dtype = x.dtype

    off = offset.reshape(b, ho, wo, dg, k2, 2)

    # base sampling grid (broadcast over dg, k2)
    oy = jax.lax.broadcasted_iota(dtype, (b, ho, wo, dg, k2), 1)
    ox = jax.lax.broadcasted_iota(dtype, (b, ho, wo, dg, k2), 2)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (b, ho, wo, dg, k2), 4)
    ky = (kidx // kw).astype(dtype)
    kx = jax.lax.rem(kidx, kw).astype(dtype)

    sy = oy * stride - padding + ky * dilation + off[..., 0]
    sx = ox * stride - padding + kx * dilation + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ly = sy - y0
    lx = sx - x0

    # flatten image per deformable group: (B, H*W, dg, cg)
    flat = x.reshape(b, h * w, dg, cg)

    def corner(yc, xc, wy, wx):
        valid = (yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        idx = yi * w + xi  # (B, Ho, Wo, dg, K2)
        idxf = idx.reshape(b, -1, dg)  # (B, Ho*Wo*K2', dg) with dg kept
        # gather per batch & def-group
        g = jnp.take_along_axis(
            flat,  # (B, HW, dg, cg)
            idxf[..., None],  # (B, N, dg, 1)
            axis=1,
        )  # (B, N, dg, cg)
        g = g.reshape(b, ho, wo, dg, k2, cg)
        wgt = (jnp.where(valid, 1.0, 0.0) * wy * wx)[..., None]
        return g * wgt

    cols = (
        corner(y0, x0, 1.0 - ly, 1.0 - lx)
        + corner(y0, x0 + 1.0, 1.0 - ly, lx)
        + corner(y0 + 1.0, x0, ly, 1.0 - lx)
        + corner(y0 + 1.0, x0 + 1.0, ly, lx)
    )  # (B, Ho, Wo, dg, K2, cg)

    if mask is not None:
        m = mask.reshape(b, ho, wo, dg, k2, 1)
        cols = cols * m

    # (B, Ho, Wo, K2, C) with channels restored to their original order
    cols = jnp.moveaxis(cols, 3, 4)  # (B, Ho, Wo, K2, dg, cg)
    return cols.reshape(b, ho, wo, k2, c)


def modulated_deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """DCNv2 forward (DCNv1 when mask is None).

    x (B, H, W, C); weight (kh, kw, C // groups, Cout). Returns
    (B, Ho, Wo, Cout). The K2*C x Cout contraction runs on the MXU.
    """
    kh, kw, cin_g, cout = weight.shape
    b, h, w, c = x.shape
    assert c == cin_g * groups, f"x has {c} ch, weight expects {cin_g * groups}"
    cols = deformable_im2col(x, offset, mask, (kh, kw), stride, padding,
                             dilation, deformable_groups)
    bdim, ho, wo, k2, _ = cols.shape

    if groups == 1:
        lhs = cols.reshape(bdim, ho, wo, k2 * c)
        rhs = weight.reshape(k2 * c, cout)
        out = jax.lax.dot_general(
            lhs, rhs, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        cg = c // groups
        og = cout // groups
        lhs = cols.reshape(bdim, ho, wo, k2, groups, cg)
        lhs = jnp.moveaxis(lhs, 4, 3).reshape(bdim, ho, wo, groups, k2 * cg)
        # weight (kh, kw, cg, cout) with cout = groups * og (group-major):
        # -> (groups, k2 * cg, og) matching the lhs (k2-major, cg-minor) flatten.
        rhs = weight.reshape(kh * kw, cg, groups, og)
        rhs = jnp.moveaxis(rhs, 2, 0).reshape(groups, k2 * cg, og)
        out = jnp.einsum("bhwgk,gko->bhwgo", lhs, rhs,
                         preferred_element_type=jnp.float32)
        out = out.reshape(bdim, ho, wo, cout).astype(x.dtype)

    if bias is not None:
        out = out + bias
    return out


def deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """DCNv1: deformable conv without modulation (reference deform_conv_cuda.cu)."""
    return modulated_deform_conv(x, offset, None, weight, bias, stride,
                                 padding, dilation, groups, deformable_groups)
