"""NLSPN model, TPU-native (Flax linen, NHWC).

Re-design of the reference network (/root/reference/src/model/nlspnmodel.py):
dual-branch encoder (RGB conv + S2D sparse-depth pyramid), ResNet-18/34
stages, a shared transposed-conv decoder with skip concats, and four heads
(initial depth, offsets+affinities, confidence), followed by ``prop_time``
iterations of confidence-weighted spatial propagation with a ConvGRU
affinity refresh.

TPU-first choices:
  * The propagation loop is UNROLLED by default (``prop_loop='unroll'``):
    device-profiling showed `flax.linen.scan` stacks every iteration's
    backward residuals along a leading axis, and XLA's layouts for those
    stacked small-channel tensors pad up to 10.7x (OOM without remat;
    slow with it). Unrolled, residuals are individual naturally-laid-out
    buffers. ``prop_loop='scan'`` (compact HLO, remat) remains available
    for fast-compile iteration; both share one param tree.
  * Each loop iteration's elementwise work (confidence weighting, input
    preservation blend, clamping) is fused into the propagation stencil via
    the Pallas kernel (`ops/pallas/local_prop.py`) when on TPU.
  * Everything is static-shaped; the decode_aff over-padding trim
    (reference ``_clip_as``, :237-250) is a static slice.

Architecture trace parity: SURVEY.md section 2.2; channels/resolutions match
the reference exactly (encoder 32+32 -> 64 -> 128@1/2 -> 256@1/4 -> 256@1/8;
decoder 128@1/4, 64@1/2, 64@1/1; heads on concat(fd2, fe2) then fe1).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.models.common import (
    BatchNorm,
    Conv,
    ConvBNReLU,
    ConvTBNReLU,
    concat_trim,
    torch_bias_init,
    torch_conv_kernel_init,
)
from nlspn_eccv20_tpu.models.resnet import make_encoder_stages
from nlspn_eccv20_tpu.ops import (
    insert_center_offset,
    normalize_affinity,
    propagate_deformable,
)
from nlspn_eccv20_tpu.ops.affinity import normalize_affinity_planar
from nlspn_eccv20_tpu.ops.planar import planar_channel_mlp
from nlspn_eccv20_tpu.ops.propagate import propagate_local_planar


class S2D(nn.Module):
    """Sparse-to-dense depth encoder (reference nlspnmodel.py:406-462).

    Min-pool pyramid (k = 3,5,7,9; zeros flagged with a -999 sentinel so they
    never win the min) + max-pool pyramid (k = 11,13), two 1x1 convs, concat
    with the raw sparse depth, 3x3 conv to 32 channels. All BN-free.

    TPU layout note: the pyramid/1x1-conv stage runs on PLANAR (B, H, W)
    planes with the 1x1 convs expressed as scalar-weighted plane sums. In
    NHWC these 6/8/16-channel full-res tensors each pad to 128 lanes
    (425 MB apiece at NYU batch 12 instead of ~25 MB) and device profiling
    showed S2D alone costing ~16 ms/step from that padding. Only the final
    17-channel tensor is materialized NHWC, for the 3x3 MXU conv. Pooling
    stays in f32 regardless of compute dtype: the +-999 zero-sentinel is not
    representable in bf16 (rounds to 1000), which would break the unmask
    comparison.
    """

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, dep, train: bool = False):
        # Cascaded pyramid: a k+2 min/max pool is EXACTLY a 3x3 pool of
        # the k pool (max is associative/idempotent and the -inf SAME
        # padding is its identity, so the composition is bitwise equal to
        # the reference's direct k x k windows, nlspnmodel.py:414-436).
        # Direct windows total 9+25+...+169 = 454 window-elements/pixel;
        # the cascade needs 10 3x3 pools = 90 — measured >2x faster at
        # b=1 serving where this pyramid was 40% of latency (1.07 ms of
        # 2.6 ms, r03 per-op profile).
        def mp3(x):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
                ((0, 0), (1, 1), (1, 1)))

        pools = []
        d = dep[..., 0].astype(jnp.float32)  # (B, H, W) planar
        neg = jnp.where(d == 0.0, -999.0, -d)
        m = neg
        for _ in (3, 5, 7, 9):  # min pyramid via chained 3x3 max on -d
            m = mp3(m)
            z = -m
            pools.append(jnp.where(z == 999.0, 0.0, z))
        m = d
        for s in range(3, 14, 2):  # max pyramid: keep k=11 and k=13
            m = mp3(m)
            if s in (11, 13):
                pools.append(m)

        # 1x1 convs as scalar-weighted plane sums (exact same math as the
        # reference Conv2d(k=1) + bias + relu; param shapes unchanged).
        w0 = self.param("pool_conv0_kernel", torch_conv_kernel_init,
                        (1, 1, 6, 8), jnp.float32)
        b0 = self.param("pool_conv0_bias", torch_bias_init(6), (8,),
                        jnp.float32)
        w1 = self.param("pool_conv1_kernel", torch_conv_kernel_init,
                        (1, 1, 8, 16), jnp.float32)
        b1 = self.param("pool_conv1_bias", torch_bias_init(8), (16,),
                        jnp.float32)
        dt = self.dtype or dep.dtype
        p6 = jnp.stack(pools, axis=1).astype(dt)  # (B, 6, H, W)
        f16 = planar_channel_mlp(p6, w0[0, 0].astype(dt), b0.astype(dt),
                                 w1[0, 0].astype(dt), b1.astype(dt))

        feat = jnp.concatenate(
            [jnp.moveaxis(f16, 1, -1), d.astype(dt)[..., None]],
            axis=-1)  # (B, H, W, 17) once
        return ConvBNReLU(32, kernel=3, bn=False, dtype=self.dtype,
                          name="conv")(feat, train)


class ConvGRU(nn.Module):
    """3x3 conv GRU over the affinity hidden state (reference :386-403).

    The z and r gates read the SAME concat(h, x) input; their convs are
    fused into one 2*hidden-out conv at apply time (exact same math — the
    per-gate kernels/biases keep the reference shapes so checkpoints
    interchange), halving the hx reads. This runs 11x per step inside the
    propagation loop.
    """

    hidden_dim: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        in_ch = h.shape[-1] + x.shape[-1]
        fan_in = in_ch * 9
        ks, bs = [], []
        for gate in ("convz", "convr"):
            ks.append(self.param(f"{gate}_kernel", torch_conv_kernel_init,
                                 (3, 3, in_ch, hd), jnp.float32))
            bs.append(self.param(f"{gate}_bias", torch_bias_init(fan_in),
                                 (hd,), jnp.float32))
        dt = self.dtype or h.dtype
        hx = jnp.concatenate([h, x], axis=-1).astype(dt)
        zr = jax.lax.conv_general_dilated(
            hx, jnp.concatenate(ks, axis=-1).astype(dt), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.concatenate(bs).astype(dt)
        z = nn.sigmoid(zr[..., :hd])
        r = nn.sigmoid(zr[..., hd:])
        q = jnp.tanh(Conv(hd, 3, dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class _ConvParams(nn.Module):
    """Declare Conv-compatible params (same names/shapes/inits as
    models.common.Conv) without running the conv — fused-path twin of
    _ConvTParams."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        from nlspn_eccv20_tpu.models.common import (
            torch_bias_init, torch_conv_kernel_init)

        fan_in = self.in_features * 9
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", torch_bias_init(fan_in),
                          (self.features,), jnp.float32)
        return kernel, bias


class _ConvScope(nn.Module):
    """Scope shim mirroring ConvBNReLU's child naming (<name>/conv/...)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _ConvParams(self.features, self.in_features, name="conv")()


class EncodeDep(nn.Module):
    """Depth -> GRU input feature at 1/8 (reference :134-138).

    Takes the loop-carried depth as a PLANAR (B, 1, H, W) plane. The
    conv0(1->16)+conv1(16->2c) front — whose 1/16-channel tensors pad 8x+
    in XLA's TPU layouts — runs as ONE fused Pallas kernel
    (ops/pallas/dep_encode_front.py); conv2 (256ch, well-shaped) stays a
    stock conv. The module path (fused_kernels='off') is identical math.
    """

    cfg: Config
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg.GRU_input_dim
        h, w = x.shape[2], x.shape[3]
        aligned = h % 4 == 0 and w % 4 == 0
        if use_fused_kernels(self.cfg) and not aligned:
            import logging

            logging.getLogger(__name__).warning(
                "dep_encode_front fused kernel needs h,w divisible by 4; "
                "got (%d, %d) — falling back to stock convs for this shape",
                h, w)
        if use_fused_kernels(self.cfg) and aligned:
            from nlspn_eccv20_tpu.ops.pallas.dep_encode_front import (
                dep_encode_front)

            w0, b0 = _ConvScope(16, 1, name="conv0")()
            w1, b1 = _ConvScope(2 * c, 16, name="conv1")()
            dt = self.dtype or x.dtype
            y = dep_encode_front(x[:, 0].astype(jnp.float32),
                                 w0, b0, w1, b1, dt)
        else:
            y = ConvBNReLU(16, 3, 2, bn=False, planar_in=True,
                           dtype=self.dtype, name="conv0")(x, train)
            y = ConvBNReLU(2 * c, 3, 2, bn=False, dtype=self.dtype,
                           name="conv1")(y, train)
        return ConvBNReLU(c, 3, 2, bn=False, dtype=self.dtype,
                          name="conv2")(y, train)


class _ConvTParams(nn.Module):
    """Declare ConvTranspose-compatible params (same names/shapes/inits as
    models.common.ConvTranspose) without running the conv — lets the fused
    Pallas path share one param tree with the module path, so checkpoints
    interchange and prop_loop/fused_kernels variants stay compatible."""

    features: int
    in_features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        from nlspn_eccv20_tpu.models.common import (
            torch_bias_init, torch_conv_kernel_init)

        fan_in = self.features * 9
        kinit = (nn.initializers.zeros if self.zero_init
                 else torch_conv_kernel_init)
        binit = (nn.initializers.zeros if self.zero_init
                 else torch_bias_init(fan_in))
        kernel = self.param("kernel", kinit,
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", binit, (self.features,), jnp.float32)
        return kernel, bias


class _ConvTScope(nn.Module):
    """Scope shim mirroring ConvTBNReLU's child naming (<name>/conv/...)."""

    features: int
    in_features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        return _ConvTParams(self.features, self.in_features,
                            zero_init=self.zero_init, name="conv")()


def use_fused_kernels(cfg: Config) -> bool:
    """Resolve cfg.fused_kernels: 'auto' enables the fused Pallas chain
    kernels on TPU (off-TPU the ops fall back to the identical pure-JAX
    composition, so 'auto' is safe everywhere). Under spatial sharding
    Pallas custom calls would block the SPMD partitioner, so 'auto'
    resolves to off ('on' is rejected at config validation)."""
    if cfg.num_spatial_shards > 1:
        return False
    return cfg.fused_kernels in ("auto", "on")


class DecodeAff(nn.Module):
    """GRU hidden state -> raw neighbor affinities at 1/1 (reference :140-144).

    The deconv1+deconv2 tail (16 and num_neighbors channels — tensors whose
    NHWC layouts pad 8-16x on TPU) runs as ONE fused Pallas kernel
    (ops/pallas/dec_aff_tail.py): phase-decomposed MXU matmuls with the
    16-channel intermediate resident in VMEM, emitting the loop's PLANAR
    (B, num_neighbors, H, W) affinity layout directly. The module path
    (fused_kernels='off') computes the identical math with stock convs.
    """

    cfg: Config
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg.GRU_hidden_dim
        x = ConvTBNReLU(2 * c, 3, 2, 1, 1, bn=False, dtype=self.dtype,
                        name="deconv0")(x, train)
        if use_fused_kernels(self.cfg):
            from nlspn_eccv20_tpu.ops.pallas.dec_aff_tail import (
                decode_aff_tail)

            w1, b1 = _ConvTScope(16, 2 * c, name="deconv1")()
            w2, b2 = _ConvTScope(self.cfg.num_neighbors, 16,
                                 zero_init=self.cfg.zero_init_aff,
                                 name="deconv2")()
            return decode_aff_tail(x, w1, b1, w2, b2)
        x = ConvTBNReLU(16, 3, 2, 1, 1, bn=False, dtype=self.dtype,
                        name="deconv1")(x, train)
        return ConvTBNReLU(self.cfg.num_neighbors, 3, 2, 1, 1, bn=False,
                           relu=False, zero_init=self.cfg.zero_init_aff,
                           planar_out=True, dtype=self.dtype,
                           name="deconv2")(x, train)


class EncodeAff(nn.Module):
    """Initial affinity -> GRU hidden state at 1/8, tanh (reference :127-132)."""

    cfg: Config
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg.GRU_hidden_dim
        x = ConvBNReLU(16, 3, 2, bn=False, dtype=self.dtype, name="conv0")(x, train)
        x = ConvBNReLU(2 * c, 3, 2, bn=False, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNReLU(c, 3, 2, bn=False, relu=False, dtype=self.dtype,
                       name="conv2")(x, train)
        return jnp.tanh(x)


class Heads(nn.Module):
    """All prediction heads, fused into two convolutions (exact same math).

    The reference runs 2-3 independent two-stage heads (initial depth,
    offset+affinity, confidence; nlspnmodel.py:67-86,296-315). Every stage-1
    conv reads the SAME 128-ch full-res input, and every stage-2 conv reads
    concat(its own 64-ch feature, fe1) — at NYU batch 12 that is ~5 GB/step
    of redundant HBM traffic on a bandwidth-bound step. Fused here:

      * stage 1: ONE conv 128 -> 64*n_heads, ONE BatchNorm (BN is
        per-channel, so one BN over the concatenated channels is identical
        to n separate BNs), one relu;
      * stage 2: ONE conv over concat(stage1_out, fe1) with a
        block-structured kernel — each head's outputs contract only with its
        own 64-ch block plus the shared fe1 block, zeros elsewhere, so the
        result equals the per-head convs exactly.

    Per-head stage-2 kernels/biases are stored with the reference's shapes
    (3, 3, 128, n_out) and init (fan_in = 128*3*3, zero-init for the
    offset/affinity head) and assembled into the fused kernel at apply time:
    a few KB of weight shuffling per step against ~GBs less activation
    traffic.
    """

    cfg: Config
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, fd2fe2, fe1, train: bool = False):
        cfg = self.cfg
        n_off_aff = 3 * cfg.num_neighbors if cfg.offset else cfg.num_neighbors
        heads = [("id", 1), ("off_aff", n_off_aff)]
        if cfg.conf_prop:
            heads.append(("cf", 1))
        width = 64  # per-head stage-1 channels (reference :67,72,78)

        y = Conv(width * len(heads), 3, 1, use_bias=False, dtype=self.dtype,
                 name="dec1_conv")(fd2fe2)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="dec1_bn")(y)
        y = nn.relu(y)

        total = sum(n for _, n in heads)
        in_ch = width * len(heads) + fe1.shape[-1]
        kernel = jnp.zeros((3, 3, in_ch, total), jnp.float32)
        biases = []
        c0 = 0
        for i, (name, n_out) in enumerate(heads):
            zero = cfg.zero_init_aff and name == "off_aff"
            kinit = nn.initializers.zeros if zero else torch_conv_kernel_init
            binit = nn.initializers.zeros if zero else torch_bias_init(
                (width + fe1.shape[-1]) * 9)
            k = self.param(f"{name}_dec0_kernel", kinit,
                           (3, 3, width + fe1.shape[-1], n_out), jnp.float32)
            b = self.param(f"{name}_dec0_bias", binit, (n_out,), jnp.float32)
            kernel = kernel.at[:, :, i * width:(i + 1) * width,
                               c0:c0 + n_out].set(k[:, :, :width])
            kernel = kernel.at[:, :, width * len(heads):,
                               c0:c0 + n_out].set(k[:, :, width:])
            biases.append(b)
            c0 += n_out

        dt = self.dtype or y.dtype
        bias_cat = jnp.concatenate(biases)
        # Batch-dependent routing for the stage-2 conv (r05, VERDICT r4
        # item 9). At TRAIN batches the direct conv wins: the tap-major
        # 1x1-conv + shifted-add decomposition measured +2.6 ms/step bf16
        # at NYU b=12 (the 9*total-channel intermediate's HBM traffic
        # exceeds the MXU savings), and the Pallas small_conv3x3_planar
        # kernel lost too (+1.5 ms fp32 / +15 ms bf16 — see
        # ops/pallas/small_conv3x3.py). At b=1 SERVING the direct conv is
        # the single largest profiled site (5.39 ms of the 36.6 ms KITTI
        # b=1 latency, ~13x over roofline: `total`~10 output channels fill
        # 10 of 128 MXU lanes — devtools/profile_refresh.py), and the SAME
        # decomposition wins 3.39x standalone (2701 -> 798 us,
        # devtools/exp_heads_stage2_b1.py): the 1x1 conv to 9*total
        # tap-major channels fills ~70% of the MXU and the 9 shifted adds
        # run planar (an NHWC total-ch add would pad 12.8x in lanes).
        x2 = jnp.concatenate([y, fe1.astype(y.dtype)], axis=-1)
        if x2.shape[0] == 1:
            bsz, hh, ww = x2.shape[0], x2.shape[1], x2.shape[2]
            kflat = jnp.moveaxis(kernel.reshape(9, in_ch, total),
                                 0, 1).reshape(in_ch, 9 * total)
            ym = jnp.einsum("bhwc,cd->bhwd", x2.astype(dt), kflat.astype(dt))
            yp = jnp.moveaxis(ym, -1, 1).reshape(bsz, 9, total, hh, ww)
            yp = jnp.pad(yp, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
            acc = jnp.zeros((bsz, total, hh, ww), dt)
            for t, (dy, dx) in enumerate((dy, dx) for dy in (0, 1, 2)
                                         for dx in (0, 1, 2)):
                acc = acc + yp[:, t, :, dy:dy + hh, dx:dx + ww]
            y2p = (acc + bias_cat.astype(dt)[None, :, None, None]).astype(
                jnp.float32)
        else:
            y2 = jax.lax.conv_general_dilated(
                x2.astype(dt), kernel.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias_cat.astype(dt)
            y2p = jnp.moveaxis(y2, -1, 1).astype(jnp.float32)

        pred_init_p = nn.relu(y2p[:, 0])                      # (B, H, W)
        off_aff_p = y2p[:, 1:1 + n_off_aff]                   # planar
        conf_p = nn.sigmoid(y2p[:, 1 + n_off_aff]) if cfg.conf_prop else None
        return pred_init_p, off_aff_p, conf_p


def _offset_uses_pallas(cfg: Config, h: int, w: int,
                        train: bool = True) -> bool:
    """Resolve the deformable-gather backend for the --offset path.

    'pallas' (and 'auto' on a capable backend) routes the fused
    shift-accumulate Pallas kernels (ops/pallas/deform_prop.py, r05:
    identical windowed semantics, custom Pallas backward; measured
    264.7 vs 410.8 ms/step at NYU b=12 R=4 f32, KITTI offset train
    571.0 -> 420.0 ms via width tiling — docs/PERFORMANCE.md). Never
    under spatial sharding: Pallas custom calls are opaque to the SPMD
    partitioner (config already rejects prop_impl='pallas' there; 'auto'
    resolves to xla). On WIDTH-TILED shapes (KITTI-class,
    `_width_tiles` > 1) 'auto' routes pallas for TRAINING only: the
    tiled kernels win the train step (+36%) but lose eval/serving
    (KITTI b=1 37.83 vs 26.57 ms xla — the tile gather/scatter rides on
    every cond branch), while untiled shapes win both (NYU b=1 5.73 vs
    6.46 ms, b=12 eval 65.1 vs 85.0 ms).
    """
    if not (cfg.offset and cfg.offset_window):
        return False
    if cfg.prop_impl not in ("auto", "pallas") or cfg.num_spatial_shards > 1:
        return False
    from nlspn_eccv20_tpu.ops.pallas.deform_prop import (
        _width_tiles,
        deform_prop_available,
        deform_prop_supported,
    )

    if not (deform_prop_available()
            and deform_prop_supported(h, w, cfg.prop_kernel,
                                      cfg.offset_window)):
        return False
    if cfg.prop_impl == "pallas":
        return True  # explicit user choice
    if not train and (_width_tiles(h, w, cfg.prop_kernel,
                                   cfg.offset_window) or 1) > 1:
        return False
    return True


def _prop_and_blend(cfg: Config, pred, aff, conf, dep, off,
                    train: bool = False):
    """One propagation step + input-preservation blend + optional clamp.

    Reference loop body (nlspnmodel.py:350-361), in PLANAR layout:
    pred/conf/dep are (B, H, W), aff is (B, K2, H, W) — the trailing
    singleton channel of an NHWC plane would be padded to 128 lanes on TPU,
    so the loop never carries one. `off` stays NHWC (B, H, W, 2*K2) for the
    (non-default) deformable path.
    """
    feat = pred * conf if conf is not None else pred
    if off is not None:
        # fallback=not train: the exact-gather cond branch does not
        # compile inside the unrolled TRAIN step (s32 scatter temps pad
        # 128x -> OOM, see ops/propagate.propagate_deformable); training
        # clamps offsets into the window instead, eval keeps the exact
        # runtime fallback.
        impl = cfg.prop_impl
        if impl == "auto":
            impl = "pallas" if _offset_uses_pallas(
                cfg, pred.shape[1], pred.shape[2], train=train) else "xla"
        out = propagate_deformable(feat[..., None], off,
                                   jnp.moveaxis(aff, 1, -1),
                                   kernel=cfg.prop_kernel,
                                   radius=cfg.offset_window or None,
                                   impl=impl,
                                   fallback=not train,
                                   neighbor_loop=cfg.offset_neighbor_loop,
                                   )[..., 0]
        if cfg.preserve_input:
            m = (dep > 0.0).astype(out.dtype)
            out = (1.0 - m) * out + m * dep
        if cfg.always_clip:
            out = jnp.maximum(out, 0.0)
        return out

    impl = cfg.prop_impl
    if impl == "auto":
        # Measured on v5e (see bench.py): for the per-step path XLA's fusion
        # of pad+stencil+blend edges out the Pallas stencil inside the
        # GRU-refresh loop, so 'auto' currently resolves to XLA. The Pallas
        # kernels stay selectable via prop_impl='pallas' and are benchmarked
        # continuously.
        impl = "xla"

    if impl == "pallas":
        from nlspn_eccv20_tpu.ops.pallas.local_prop import (
            fused_prop_step_planar,
        )

        return fused_prop_step_planar(
            pred, aff, conf=conf, dep=dep if cfg.preserve_input else None,
            kernel=cfg.prop_kernel, preserve=cfg.preserve_input,
            clip=cfg.always_clip)

    out = propagate_local_planar(feat, aff, kernel=cfg.prop_kernel)
    if cfg.preserve_input:
        m = (dep > 0.0).astype(out.dtype)
        out = (1.0 - m) * out + m * dep
    if cfg.always_clip:
        out = jnp.maximum(out, 0.0)
    return out


class PropStep(nn.Module):
    """Scanned loop body: propagate + blend + (GRU affinity refresh).

    Runs iterations 1 .. K-1 of the reference loop (nlspnmodel.py:340-373);
    the final iteration (no GRU refresh afterwards) runs outside the scan.
    """

    cfg: Config
    dtype: Optional[Any] = None
    train: bool = False

    @nn.compact
    def __call__(self, carry, _):
        cfg = self.cfg
        pred = _prop_and_blend(cfg, carry["pred"], carry["aff"],
                               carry.get("conf"), carry.get("dep"),
                               carry.get("off"), train=self.train)
        carry = dict(carry, pred=pred)

        if cfg.use_GRU:
            dep_feat = EncodeDep(cfg, dtype=self.dtype, name="encode_dep")(
                (pred / cfg.max_depth)[:, None].astype(
                    self.dtype or pred.dtype))
            aff_feat = ConvGRU(cfg.GRU_hidden_dim, dtype=self.dtype,
                               name="GRU")(carry["aff_feat"], dep_feat)
            raw = DecodeAff(cfg, dtype=self.dtype, name="decode_aff")(aff_feat)
            # planar (B, K2-1, Hp, Wp): trim deconv over-padding
            # (reference _clip_as, :237-250) and re-normalize.
            raw = raw[:, :, :pred.shape[1], :pred.shape[2]].astype(jnp.float32)
            aff = normalize_affinity_planar(raw, carry["gamma"], cfg.affinity)
            carry = dict(carry, aff_feat=aff_feat, aff=aff)

        return carry, pred


class NLSPNModel(nn.Module):
    """Full NLSPN network. sample: {'rgb': (B,H,W,3), 'dep': (B,H,W,1)}."""

    cfg: Config

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.precision == "bf16" else jnp.float32

    def _use_loop_kernel(self, need_inter: bool, train: bool,
                         h: int, w: int) -> bool:
        """Route the whole propagation loop through the fused Pallas loop
        kernel (ops/pallas/local_prop.py) when the affinity is constant
        across iterations (use_GRU=False, reference nlspnmodel.py:365-373
        skipped) and the caller does not need per-iteration predictions.

        'auto' NEVER selects it in-model (round-3 finding, measured +
        HLO-verified): although the standalone kernel wins 3.5-4.6x at
        per-call batch 1 on non-tiny planes (loop_kernel_profitable), the
        custom call's row-major operand-layout pin propagates upstream
        through XLA layout assignment and degrades the heads/decoder convs
        by more than the loop saves (net 0.57-0.60x in-model at NYU/KITTI
        b=1; barrier/reshape firewalls don't stop the propagation — see
        the in-line note at the call site and docs/PERFORMANCE.md).
        Round 2 shipped 'auto'->kernel and made serving slower; honest
        routing keeps XLA in-model. 'pallas' still forces the kernel
        (training included; the custom VJP recomputes through the pure-JAX
        mirror) for op-level use, tests, and future stacks.
        """
        cfg = self.cfg
        if cfg.use_GRU or cfg.offset or need_inter or cfg.prop_time < 1:
            return False
        if cfg.prop_impl != "pallas":
            return False
        from nlspn_eccv20_tpu.ops.pallas.local_prop import (
            loop_kernel_supported,
        )

        return loop_kernel_supported(h, w, cfg.prop_time, cfg.prop_kernel)

    @nn.compact
    def __call__(self, sample: Dict[str, jnp.ndarray], train: bool = False,
                 need_inter: bool = True):
        cfg = self.cfg
        dt = self.dtype
        rgb = sample["rgb"].astype(dt)
        dep = sample["dep"].astype(jnp.float32)
        nn_ = cfg.num_neighbors

        # ---- Encoder (reference :276-288) ----
        fe1_rgb = ConvBNReLU(32, 3, 1, bn=False, dtype=dt,
                             name="conv1_rgb")(rgb, train)
        if cfg.use_S2D:
            fe1_dep = S2D(dtype=dt, name="S2D")(dep.astype(dt), train)
        else:
            fe1_dep = ConvBNReLU(32, 3, 1, bn=False, dtype=dt,
                                 name="conv1_dep")(dep.astype(dt), train)
        fe1 = jnp.concatenate([fe1_rgb, fe1_dep], axis=-1)          # 64 @ 1/1

        layer1, layer2, layer3 = make_encoder_stages(cfg.network, dtype=dt)
        fe2 = layer1(fe1, train=train)                               # 64 @ 1/1
        fe3 = layer2(fe2, train=train)                               # 128 @ 1/2
        fe4 = layer3(fe3, train=train)                               # 256 @ 1/4
        fe5 = ConvBNReLU(256, 3, 2, dtype=dt, name="conv5")(fe4, train)  # 256 @ 1/8

        # ---- Shared decoder (reference :291-293) ----
        fd4 = ConvTBNReLU(128, 3, 2, 1, 1, dtype=dt, name="dec4")(fe5, train)
        fd3 = ConvTBNReLU(64, 3, 2, 1, 1, dtype=dt, name="dec3")(
            concat_trim(fd4, fe4), train)
        fd2 = ConvTBNReLU(64, 3, 2, 1, 1, dtype=dt, name="dec2")(
            concat_trim(fd3, fe3), train)

        # ---- Heads (reference :296-315), fused: see Heads docstring ----
        # Heads returns PLANAR tensors (the loop's layout).
        pred_init_p, off_aff_p, conf_p = Heads(cfg, dtype=dt, name="heads")(
            concat_trim(fd2, fe2), fe1, train)

        if cfg.offset:
            off_raw = jnp.moveaxis(off_aff_p[:, :2 * nn_], 1, -1)
            aff_raw_p = off_aff_p[:, 2 * nn_:]
            off = insert_center_offset(off_raw)
        else:
            off = None
            aff_raw_p = off_aff_p

        # ---- Affinity normalization (reference :179-201,323-325) ----
        gamma_init = {
            "TC": float(nn_),
            "TGASS": cfg.affinity_gamma * nn_,
        }.get(cfg.affinity, 1.0)
        gamma = self.param("aff_scale_const",
                           nn.initializers.constant(gamma_init), (1,),
                           jnp.float32)
        if cfg.affinity != "TGASS":
            # frozen for AS/ASS/TC (reference :95-102)
            gamma = jax.lax.stop_gradient(gamma)
        # Planar loop state from here on (see _prop_and_blend layout note).
        aff_p = normalize_affinity_planar(aff_raw_p, gamma, cfg.affinity)
        dep_p = dep[..., 0]

        # ---- Input preservation setup (reference :328-334) ----
        if cfg.preserve_input:
            mask_fix = jax.lax.stop_gradient((dep_p > 0.0).astype(jnp.float32))
            if conf_p is not None:
                conf_p = (1.0 - mask_fix) * conf_p + mask_fix
        confidence = conf_p[..., None] if conf_p is not None else None

        # ---- Pre-loop blend/clip for k == 1 (reference :342-348) ----
        new_pred = pred_init_p
        if cfg.preserve_input:
            new_pred = (1.0 - mask_fix) * new_pred + mask_fix * dep_p
        if cfg.always_clip:
            new_pred = jnp.maximum(new_pred, 0.0)

        # ---- Propagation loop (reference :340-373) ----
        carry = {"pred": new_pred, "aff": aff_p}
        if conf_p is not None:
            carry["conf"] = conf_p
        if cfg.preserve_input:
            carry["dep"] = dep_p
        if off is not None:
            carry["off"] = off
        if cfg.use_GRU:
            carry["aff_feat"] = EncodeAff(cfg, dtype=dt, name="encode_aff")(
                jnp.moveaxis(aff_p, 1, -1).astype(dt), train)
            carry["gamma"] = gamma

        k = cfg.prop_time
        h_, w_ = new_pred.shape[1], new_pred.shape[2]
        if self._use_loop_kernel(need_inter, train, h_, w_):
            # Constant-affinity fast path: all K propagate+blend+clip steps
            # fused in one VMEM-resident Pallas kernel (the pre-loop k==1
            # blend above already happened, so pre_blend=False).
            from nlspn_eccv20_tpu.ops.pallas.local_prop import (
                propagate_loop_pallas_planar,
            )

            # NOTE (r03, measured): inside the full model this path is
            # SLOWER than the XLA loop at every tested shape (0.57-0.60x
            # at NYU/KITTI b=1) even though the standalone kernel wins
            # 4.4-4.6x there — the custom call pins default row-major
            # layouts on its operands and XLA layout assignment propagates
            # that upstream into the heads/decoder convs (HLO-verified:
            # T(1,128) degenerate conv layouts, +2.6 ms at NYU b=1).
            # Neither an optimization_barrier nor a reshape sandwich stops
            # the propagation (both measured identical; flat reshapes are
            # bitcasts). 'auto' therefore never selects this branch
            # in-model (_use_loop_kernel); it remains reachable via
            # prop_impl='pallas' for op-level use and tests.

            new_pred = propagate_loop_pallas_planar(
                new_pred, aff_p, conf=conf_p,
                dep=dep_p if cfg.preserve_input else None,
                steps=k, kernel=cfg.prop_kernel,
                preserve=cfg.preserve_input, clip=cfg.always_clip)
            if not cfg.always_clip:
                new_pred = jnp.maximum(new_pred, 0.0)
            return {
                "pred": new_pred[..., None],
                "pred_init": pred_init_p[..., None],
                # per-iteration predictions are not materialized on this
                # path (need_inter=False contract): empty, not a stand-in —
                # a 1-element list holding the FINAL pred made epoch-end TB
                # grids label it "step 0" (ADVICE r2). Consumers must treat
                # an empty list as "not collected".
                "pred_inter": [],
                "offset": off,
                "aff": jnp.moveaxis(aff_p, 1, -1),
                "gamma": jax.lax.stop_gradient(gamma),
                "confidence": confidence,
            }

        inter = []
        # The non-local (--offset) XLA windowed gather inlines ~900
        # shifted slices per step; UNROLLED x12 steps that graph makes
        # XLA's optimizer pathological (r03 measured: CPU compile >28 min
        # and still going vs 3.2 min under scan; TPU 35-55 min unrolled),
        # so the XLA offset path always runs the scan loop. The Pallas
        # deformable kernel (r05) is ONE custom call per step — its
        # unrolled graph is small like the default path's, compiles in
        # ~2-3 min cold, and skips the scan-remat recompute entirely
        # (unroll 303.2 vs scan 355.8 ms/step at NYU b=12 R=4 f32
        # during bring-up; final kernels 264.7 — docs/PERFORMANCE.md),
        # so it honors cfg.prop_loop ('unroll' default like the
        # fixed-local path).
        offset_pallas = cfg.offset and _offset_uses_pallas(
            cfg, new_pred.shape[1], new_pred.shape[2], train=train)
        loop_impl = ("scan" if (cfg.offset and k > 2 and not offset_pallas)
                     else cfg.prop_loop)
        if k > 1:
            if loop_impl == "scan":
                # Compact HLO / fast compile, but the scan STACKS every
                # iteration's backward residuals along a leading axis, and
                # XLA's layouts for those stacked small-channel tensors pad
                # catastrophically (measured 10.7x: f32[11,12,8,228,304]
                # 279 MB unpadded -> 2.91 GB padded). Without remat that
                # OOMs a 16 GB chip at NYU batch 12, so scan implies remat
                # of the loop body (recompute instead of store).
                Body = nn.remat(PropStep, prevent_cse=False)
                Scanned = nn.scan(
                    Body,
                    variable_broadcast="params",
                    split_rngs={"params": False},
                    length=k - 1,
                )
                carry, ys = Scanned(cfg, dtype=dt, train=train,
                                    name="prop_step")(
                    carry, None)
                inter = [ys[i] for i in range(k - 1)]
            else:
                # Unrolled: one PropStep instance called K-1 times (params
                # shared, tree identical to the scan path so checkpoints
                # interchange). Residuals live as individual buffers with
                # natural layouts — no stacking blowup, no remat recompute.
                body = PropStep(cfg, dtype=dt, train=train, name="prop_step")
                for _ in range(k - 1):
                    carry, y = body(carry, None)
                    inter.append(y)

        # Final iteration: propagate only, no GRU refresh (reference k == K).
        new_pred = _prop_and_blend(cfg, carry["pred"], carry["aff"],
                                   carry.get("conf"), carry.get("dep"),
                                   carry.get("off"), train=train)
        inter.append(new_pred)

        if not cfg.always_clip:
            new_pred = jnp.maximum(new_pred, 0.0)

        return {
            "pred": new_pred[..., None],
            "pred_init": pred_init_p[..., None],
            "pred_inter": [p[..., None] for p in inter],
            "offset": off,
            "aff": jnp.moveaxis(carry["aff"], 1, -1),
            "gamma": jax.lax.stop_gradient(gamma),
            "confidence": confidence,
        }
