"""Deformable position-sensitive RoI pooling (op-library parity).

Reference: /root/reference/src/model/deformconv/src/cuda/
deform_psroi_pooling_cuda.cu (DeformablePSROIPoolForwardKernel, :58-146).
Shipped-but-unused by NLSPN (SURVEY.md section 2.3); provided here for op
surface parity.

Semantics (matching the CUDA kernel):
  * rois: (N, 5) [batch_idx, x1, y1, x2, y2] in image coords; scaled by
    spatial_scale, then roi start -= 0.5 ("roi_start_w = round(...) *
    spatial_scale - 0.5"), width/height clamped to >= 0.1.
  * the RoI is divided into pooled_size x pooled_size bins; bin (i, j)
    averages sample_per_part^2 bilinear samples from the part-specific
    channel slice (position-sensitive: channel block determined by the bin,
    modulo group_size x group_size parts).
  * optional per-bin offsets `trans` (N, pooled, pooled, 2 *
    num_classes... reference layout (N, 2*C', ph, pw)) scaled by trans_std
    and the roi size.
  * samples outside the image are skipped (count excludes them in the mean
    only via zero contribution; CUDA sums and divides by count of valid
    sampled points — we divide by the number of in-bounds samples like the
    CUDA `count = sample_per_part*sample_per_part` hmm: CUDA divides by
    `count` = number of samples whose (w, h) passed the bounds check).

Layout: data NHWC (B, H, W, C) with C = output_dim * group_size^2 arranged
part-major like the CUDA channel order [out_ch, part_h, part_w] -> here the
trailing dim is (output_dim, gh, gw) flattened in that order.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def deform_psroi_pooling(
    data: jnp.ndarray,
    rois: jnp.ndarray,
    trans: Optional[jnp.ndarray],
    *,
    spatial_scale: float,
    output_dim: int,
    group_size: int,
    pooled_size: int,
    part_size: Optional[int] = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> jnp.ndarray:
    """Returns (N, pooled_size, pooled_size, output_dim)."""
    b, h, w, c = data.shape
    assert c == output_dim * group_size * group_size
    n = rois.shape[0]
    ps = pooled_size
    part = part_size or ps
    spp = sample_per_part
    dtype = data.dtype

    batch_idx = rois[:, 0].astype(jnp.int32)  # (N,)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = jnp.round(rois[:, 3] + 1.0) * spatial_scale - 0.5
    y2 = jnp.round(rois[:, 4] + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)

    bin_w = roi_w / ps  # (N,)
    bin_h = roi_h / ps
    sub_w = bin_w / spp
    sub_h = bin_h / spp

    # bin grid
    bi = jax.lax.broadcasted_iota(dtype, (n, ps, ps), 1)  # bin row
    bj = jax.lax.broadcasted_iota(dtype, (n, ps, ps), 2)  # bin col

    # per-bin offsets from trans: reference indexes trans by the *part*
    # (part_h, part_w) = floor(bin * part / pooled), class 0 when trans has
    # 2 channels. trans layout here: (N, part, part, 2) with (dy, dx).
    if trans is not None and trans_std > 0:
        ph = jnp.floor(bi * part / ps).astype(jnp.int32)
        pw = jnp.floor(bj * part / ps).astype(jnp.int32)
        t = trans  # (N, part, part, 2)
        nidx = jax.lax.broadcasted_iota(jnp.int32, (n, ps, ps), 0)
        off_y = t[nidx, ph, pw, 0] * trans_std * roi_h[:, None, None]
        off_x = t[nidx, ph, pw, 1] * trans_std * roi_w[:, None, None]
    else:
        off_y = jnp.zeros((n, ps, ps), dtype)
        off_x = jnp.zeros((n, ps, ps), dtype)

    # sample grid within each bin: (spp, spp)
    si = jax.lax.broadcasted_iota(dtype, (spp, spp), 0)
    sj = jax.lax.broadcasted_iota(dtype, (spp, spp), 1)

    # absolute sampling coords: (N, ps, ps, spp, spp)
    sy = (y1[:, None, None] + bi * bin_h[:, None, None] + off_y)[..., None, None] \
        + (si + 0.5) * sub_h[:, None, None, None, None]
    sx = (x1[:, None, None] + bj * bin_w[:, None, None] + off_x)[..., None, None] \
        + (sj + 0.5) * sub_w[:, None, None, None, None]

    valid = (sy >= -0.5) & (sy <= h - 0.5) & (sx >= -0.5) & (sx <= w - 0.5)
    syc = jnp.clip(sy, 0.0, h - 1.0)
    sxc = jnp.clip(sx, 0.0, w - 1.0)

    # position-sensitive channel block per bin: part index (gh, gw)
    gh = jnp.floor(bi * group_size / ps).astype(jnp.int32)
    gw = jnp.floor(bj * group_size / ps).astype(jnp.int32)
    gh = jnp.clip(gh, 0, group_size - 1)
    gw = jnp.clip(gw, 0, group_size - 1)

    # gather the per-roi feature map slice: (N, H, W, C)
    fmap = data[batch_idx]

    y0 = jnp.floor(syc)
    x0 = jnp.floor(sxc)
    ly = (syc - y0)[..., None]
    lx = (sxc - x0)[..., None]

    csel = (gh * group_size + gw)  # (N, ps, ps) part index

    def corner(yc, xc):
        yi = jnp.clip(yc.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xc.astype(jnp.int32), 0, w - 1)
        flat = fmap.reshape(n, h * w, output_dim, group_size * group_size)
        idx = (yi * w + xi).reshape(n, -1)  # (N, ps*ps*spp*spp)
        g = jnp.take_along_axis(flat, idx[:, :, None, None], axis=1)
        g = g.reshape(n, ps, ps, spp, spp, output_dim, group_size * group_size)
        # select the part channel block per bin
        sel = csel[:, :, :, None, None, None, None]
        g = jnp.take_along_axis(g, sel, axis=-1)[..., 0]
        return g  # (N, ps, ps, spp, spp, output_dim)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    sample = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
              + v10 * ly * (1 - lx) + v11 * ly * lx)
    sample = jnp.where(valid[..., None], sample, 0.0)
    count = jnp.sum(valid, axis=(3, 4))[..., None]  # (N, ps, ps, 1)
    out = jnp.sum(sample, axis=(3, 4)) / jnp.maximum(count, 1)
    return out.astype(dtype)
