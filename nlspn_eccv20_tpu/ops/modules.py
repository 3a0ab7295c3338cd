"""Flax module wrappers over the deformable op library.

Module-level parity with the reference's Python wrappers
(/root/reference/src/model/deformconv/modules/{deform_conv,
modulated_deform_conv,deform_psroi_pooling}.py): ``DeformConv[Pack]``,
``ModulatedDeformConv[Pack]``, ``DeformRoIPooling[Pack]``. The *Pack*
variants generate their own offsets (and masks) from an internal
zero-initialized layer, so at init they behave exactly like their
non-deformable counterparts (the degeneracy the reference's test harness
checks, deformconv/test.py:36-110).

Layout conventions are this library's NHWC forms (see ops/deform_conv.py):
offsets are (dy, dx)-interleaved per kernel position, masks are one channel
per (deformable group x kernel position). Init matches the reference
``reset_parameters``: weights ~ U(-s, s) with s = 1/sqrt(fan_in), biases
zero; offset/mask generators zero-initialized (reference init_offset).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from nlspn_eccv20_tpu.ops.deform_conv import modulated_deform_conv
from nlspn_eccv20_tpu.ops.deform_psroi_pooling import deform_psroi_pooling

Dtype = Any


def _uniform_stdv(fan_in: int):
    """Reference reset_parameters: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class DeformConv(nn.Module):
    """DCNv1 module: __call__(x, offset) (reference modules/deform_conv.py:14-64)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    def _conv(self, x, offset, mask=None):
        k = self.kernel
        cin_g = x.shape[-1] // self.groups
        fan_in = cin_g * k * k
        weight = self.param("weight", _uniform_stdv(fan_in),
                            (k, k, cin_g, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        dt = self.dtype or x.dtype
        return modulated_deform_conv(
            x.astype(dt), offset.astype(dt),
            mask.astype(dt) if mask is not None else None, weight.astype(dt),
            bias.astype(dt) if bias is not None else None,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=self.groups, deformable_groups=self.deformable_groups)

    @nn.compact
    def __call__(self, x, offset):
        return self._conv(x, offset)


class DeformConvPack(DeformConv):
    """DCNv1 with self-generated offsets from a zero-init conv
    (reference modules/deform_conv.py:66-92): equals a plain conv at init."""

    @nn.compact
    def __call__(self, x):  # noqa: D401 - signature differs by design
        k = self.kernel
        n_off = self.deformable_groups * k * k * 2
        offset = nn.Conv(
            n_off, (k, k), strides=(self.stride,) * 2,
            padding=[(self.padding,) * 2] * 2,
            kernel_dilation=(self.dilation,) * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset")(x)
        return self._conv(x, offset)


class ModulatedDeformConv(DeformConv):
    """DCNv2 module: __call__(x, offset, mask)
    (reference modules/modulated_deform_conv.py:14-66)."""

    @nn.compact
    def __call__(self, x, offset, mask):
        return self._conv(x, offset, mask)


class ModulatedDeformConvPack(DeformConv):
    """DCNv2 with self-generated offsets+mask from one zero-init conv
    (reference modules/modulated_deform_conv.py:68-95): mask = sigmoid(0)
    = 0.5 per position at init, matching the reference's degeneracy
    (2 * 0.5 weighting checked by check_mdconv_zero_offset, test.py:69-110)."""

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        n = self.deformable_groups * k * k
        om = nn.Conv(
            3 * n, (k, k), strides=(self.stride,) * 2,
            padding=[(self.padding,) * 2] * 2,
            kernel_dilation=(self.dilation,) * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset_mask")(x)
        # (dy, dx) interleaved pairs, then mask channels
        offset = om[..., :2 * n]
        mask = nn.sigmoid(om[..., 2 * n:])
        return self._conv(x, offset, mask)


class DeformRoIPooling(nn.Module):
    """Deformable PS-RoI pooling module: __call__(data, rois, trans)
    (reference modules/deform_psroi_pooling.py:13-46)."""

    spatial_scale: float
    pooled_size: int
    output_dim: int
    no_trans: bool = False
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.0

    def __call__(self, data, rois, trans=None):
        if self.no_trans:
            trans = None
        return deform_psroi_pooling(
            data, rois, trans, spatial_scale=self.spatial_scale,
            output_dim=self.output_dim, group_size=self.group_size,
            pooled_size=self.pooled_size, part_size=self.part_size,
            sample_per_part=self.sample_per_part,
            trans_std=self.trans_std if trans is not None else 0.0)


class DeformRoIPoolingPack(nn.Module):
    """Two-stage deformable RoI pooling with self-generated offsets + mask
    (reference modules/deform_psroi_pooling.py:50-115): a no-trans align
    feeds a 3-layer MLP (zero-init last layer) producing per-bin (dy, dx)
    offsets and a sigmoid mask applied multiplicatively. At init (offsets 0,
    mask 0.5) it equals 0.5 x the plain PS-RoI align."""

    spatial_scale: float
    pooled_size: int
    output_dim: int
    no_trans: bool = False
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    deform_fc_dim: int = 1024

    @nn.compact
    def __call__(self, data, rois):
        ps = self.pooled_size
        pool = DeformRoIPooling(
            spatial_scale=self.spatial_scale, pooled_size=ps,
            output_dim=self.output_dim, no_trans=True,
            group_size=self.group_size, part_size=self.part_size,
            sample_per_part=self.sample_per_part)
        roi = pool(data, rois)  # (N, ps, ps, output_dim)
        if self.no_trans:
            return roi

        n = rois.shape[0]
        h = roi.reshape(n, -1)
        h = nn.relu(nn.Dense(self.deform_fc_dim, name="fc0")(h))
        h = nn.relu(nn.Dense(self.deform_fc_dim, name="fc1")(h))
        om = nn.Dense(3 * ps * ps, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="fc_offset")(h)
        om = om.reshape(n, 3, ps, ps)
        trans = jnp.stack([om[:, 0], om[:, 1]], axis=-1)  # (N, ps, ps, 2)
        mask = nn.sigmoid(om[:, 2])[..., None]             # (N, ps, ps, 1)
        out = DeformRoIPooling(
            spatial_scale=self.spatial_scale, pooled_size=ps,
            output_dim=self.output_dim, no_trans=False,
            group_size=self.group_size, part_size=self.part_size,
            sample_per_part=self.sample_per_part,
            trans_std=self.trans_std)(data, rois, trans)
        return out * mask
