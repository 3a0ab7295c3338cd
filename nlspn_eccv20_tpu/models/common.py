"""Building-block Flax modules: Conv/ConvTranspose + BN + ReLU.

TPU-native re-design of the reference helpers
(/root/reference/src/model/common.py:45-91): NHWC layout, bf16-capable
compute dtype with fp32 params, and a transposed conv implemented as an
input-dilated conv (`lax.conv_general_dilated`) with exactly PyTorch's
``ConvTranspose2d(k, s, p, output_padding)`` output geometry so released
checkpoints remain numerically portable.

Initializers reproduce the torch defaults so training dynamics match:
``kaiming_uniform(a=sqrt(5))`` == variance_scaling(1/3, fan_in, uniform);
biases ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.Conv2d default weight init: kaiming_uniform(a=sqrt(5)) over fan_in.
torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
# torchvision ResNet conv init: kaiming_normal(fan_out, nonlinearity='relu').
resnet_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """Plain NHWC conv with torch-default init and exact torch padding.

    ``planar_in``: consume a planar/NCHW (B, C, H, W) input directly
    (dimension_numbers handle the logical transpose inside the conv) — used
    at the propagation-loop boundary where the carried state is planar and a
    separate ``moveaxis`` would materialize a full-res transpose copy.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    zero_init: bool = False
    planar_in: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        pad = (k - 1) // 2
        in_ch = x.shape[1] if self.planar_in else x.shape[-1]
        fan_in = in_ch * k * k
        kinit = nn.initializers.zeros if self.zero_init else torch_conv_kernel_init
        binit = nn.initializers.zeros if self.zero_init else torch_bias_init(fan_in)
        kernel = self.param("kernel", kinit, (k, k, in_ch, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(s, s),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW" if self.planar_in else "NHWC",
                               "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class ConvTranspose(nn.Module):
    """Transposed conv matching torch ConvTranspose2d(k, s, p, output_padding).

    Implemented as an lhs-dilated conv:
        out = (in - 1) * s - 2p + k + output_padding

    The kernel is stored PRE-FLIPPED spatially (the lhs-dilated-conv
    convention) rather than flipped at apply time: device profiling showed
    XLA materializes the flip as a separate `reverse` op per call site —
    ~4 ms/step across the unrolled propagation loop's decode_aff deconvs.
    The random init is flip-symmetric so training is unaffected;
    utils/torch_import flips torch ConvTranspose2d weights on import.
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    zero_init: bool = False
    planar_out: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        # torch ConvTranspose2d weight is (in, out, k, k); kaiming_uniform uses
        # fan_in = weight.size(1) * k * k = out_ch * k * k.
        fan_in = self.features * k * k
        kinit = nn.initializers.zeros if self.zero_init else torch_conv_kernel_init
        binit = nn.initializers.zeros if self.zero_init else torch_bias_init(fan_in)
        # Stored as (k, k, in, out), spatially flipped (see docstring);
        # contraction over `in` (the input channels).
        kernel = self.param("kernel", kinit, (k, k, in_ch, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s),
            # planar_out emits (B, C, H, W) directly — the propagation loop
            # consumes planar affinities, and a post-hoc moveaxis would
            # materialize a full-res transpose copy every iteration.
            dimension_numbers=("NHWC", "HWIO",
                               "NCHW" if self.planar_out else "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,), jnp.float32)
            b = bias.astype(dtype)
            y = y + (b[:, None, None] if self.planar_out else b)
        return y


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (momentum 0.1 torch == 0.9 flax, eps 1e-5).

    Under jit with a sharded batch axis the batch statistics are computed on
    the GLOBAL batch (XLA inserts the cross-device reductions), which gives
    sync-BN semantics (reference: apex convert_syncbn_model, main.py:133) for
    free — no axis_name plumbing required.
    """

    use_running_average: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class ConvBNReLU(nn.Module):
    """conv_bn_relu equivalent (reference common.py:45-67). Bias iff no BN."""

    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = True
    relu: bool = True
    zero_init: bool = False
    planar_in: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.features, self.kernel, self.stride, use_bias=not self.bn,
                 zero_init=self.zero_init, planar_in=self.planar_in,
                 dtype=self.dtype, name="conv")(x)
        if self.bn:
            y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="bn")(y)
        if self.relu:
            y = nn.relu(y)
        return y


class ConvTBNReLU(nn.Module):
    """convt_bn_relu equivalent (reference common.py:70-91)."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    bn: bool = True
    relu: bool = True
    zero_init: bool = False
    planar_out: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.planar_out and self.bn), "planar_out is BN-free"
        y = ConvTranspose(self.features, self.kernel, self.stride, self.padding,
                          self.output_padding, use_bias=not self.bn,
                          zero_init=self.zero_init, planar_out=self.planar_out,
                          dtype=self.dtype, name="conv")(x)
        if self.bn:
            y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="bn")(y)
        if self.relu:
            y = nn.relu(y)
        return y


def concat_trim(fd: jnp.ndarray, fe: jnp.ndarray) -> jnp.ndarray:
    """Concat along channels after trimming decoder over-padding.

    Equivalent of reference ``_concat`` (nlspnmodel.py:161-177): the decoder
    feature may be up to 1 px taller/wider than the encoder skip; trim the
    bottom/right before concatenating.
    """
    hd, wd = fd.shape[1], fd.shape[2]
    he, we = fe.shape[1], fe.shape[2]
    if hd > he:
        fd = fd[:, :he, :, :]
    if wd > we:
        fd = fd[:, :, :we, :]
    return jnp.concatenate([fd, fe], axis=-1)


def clip_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Trim bottom/right padding to (h, w) (reference ``_clip_as``, :237-250)."""
    if x.shape[1] > h:
        x = x[:, :h, :, :]
    if x.shape[2] > w:
        x = x[:, :, :w, :]
    return x
