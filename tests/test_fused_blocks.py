"""Parity tests for the fused/planar rewrites of the head and S2D blocks.

The fused implementations (models/nlspn.py Heads, S2D) claim to be
algebraically identical to the reference's per-head convolutions
(/root/reference/src/model/nlspnmodel.py:296-315) and NHWC S2D pyramid
(:406-462). These tests rebuild the unfused math from the SAME parameter
values with raw lax ops and compare.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.models.nlspn import S2D, Heads


def _conv(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


@pytest.mark.parametrize("conf_prop", [True, False])
@pytest.mark.parametrize("offset", [False, True])
def test_heads_match_unfused_reference(conf_prop, offset):
    cfg = Config(conf_prop=conf_prop, offset=offset,
                 zero_init_aff=False).finalize()
    rng = np.random.default_rng(0)
    fd2fe2 = jnp.asarray(rng.standard_normal((2, 12, 16, 128)), jnp.float32)
    fe1 = jnp.asarray(rng.standard_normal((2, 12, 16, 64)), jnp.float32)

    heads = Heads(cfg)
    variables = heads.init(jax.random.PRNGKey(3), fd2fe2, fe1, train=False)
    # Heads returns PLANAR tensors (the propagation loop's layout)
    pred_init_p, off_aff_p, conf_p = heads.apply(
        variables, fd2fe2, fe1, train=False)
    pred_init = pred_init_p[..., None]
    off_aff = jnp.moveaxis(off_aff_p, 1, -1)
    confidence = conf_p[..., None] if conf_p is not None else None

    p = variables["params"]
    n_off = 3 * cfg.num_neighbors if offset else cfg.num_neighbors
    names = ["id", "off_aff"] + (["cf"] if conf_prop else [])
    widths = [1, n_off] + ([1] if conf_prop else [])

    # unfused stage 1: per-head 64-ch slices of one conv+BN+relu are the
    # per-head convs (kernel out-slices) + per-channel BN.
    k1 = p["dec1_conv"]["kernel"]
    bn = p["dec1_bn"]["BatchNorm_0"]
    y = _conv(fd2fe2, k1)
    # train=False -> BN uses running stats (init mean 0 / var 1)
    y = y / jnp.sqrt(1.0 + 1e-5) * bn["scale"] + bn["bias"]
    y = jax.nn.relu(y)

    outs = []
    for i, (name, n_out) in enumerate(zip(names, widths)):
        k = p[f"{name}_dec0_kernel"]
        b = p[f"{name}_dec0_bias"]
        xin = jnp.concatenate([y[..., 64 * i:64 * (i + 1)], fe1], axis=-1)
        outs.append(_conv(xin, k, b))

    np.testing.assert_allclose(pred_init, jax.nn.relu(outs[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(off_aff, outs[1], rtol=1e-5, atol=1e-5)
    if conf_prop:
        np.testing.assert_allclose(confidence, jax.nn.sigmoid(outs[2]),
                                   rtol=1e-5, atol=1e-5)
    else:
        assert confidence is None


def test_s2d_matches_unfused_reference():
    rng = np.random.default_rng(1)
    dep = (rng.random((2, 24, 32, 1)) > 0.9) * rng.random((2, 24, 32, 1)) * 8
    dep = jnp.asarray(dep, jnp.float32)

    s2d = S2D()
    variables = s2d.init(jax.random.PRNGKey(5), dep, train=False)
    out = s2d.apply(variables, dep, train=False)

    # unfused NHWC reference: pyramid -> 1x1 convs -> concat dep -> 3x3 conv
    d = dep[..., 0]
    pools = []
    for s in (3, 5, 7, 9):
        pd = s // 2
        neg = jnp.where(d == 0.0, -999.0, -d)
        z = -jax.lax.reduce_window(neg, -jnp.inf, jax.lax.max, (1, s, s),
                                   (1, 1, 1), ((0, 0), (pd, pd), (pd, pd)))
        pools.append(jnp.where(z == 999.0, 0.0, z))
    for s in (11, 13):
        pd = s // 2
        pools.append(jax.lax.reduce_window(d, -jnp.inf, jax.lax.max,
                                           (1, s, s), (1, 1, 1),
                                           ((0, 0), (pd, pd), (pd, pd))))
    pyr = jnp.stack(pools, axis=-1)

    p = variables["params"]
    f = jax.nn.relu(_conv_1x1(pyr, p["pool_conv0_kernel"],
                              p["pool_conv0_bias"]))
    f = jax.nn.relu(_conv_1x1(f, p["pool_conv1_kernel"],
                              p["pool_conv1_bias"]))
    f = jnp.concatenate([f, dep], axis=-1)
    ref = jax.nn.relu(_conv(f, p["conv"]["conv"]["kernel"],
                            p["conv"]["conv"]["bias"]))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def _conv_1x1(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def test_s2d_bf16_sentinel_does_not_leak():
    """In bf16 compute the +-999 sentinel rounds to 1000; pooling must stay
    in f32 so all-zero windows still densify to 0 (not +-1000)."""
    dep = jnp.zeros((1, 16, 16, 1), jnp.float32)  # all-empty depth
    s2d = S2D(dtype=jnp.bfloat16)
    variables = s2d.init(jax.random.PRNGKey(0), dep, train=False)
    out = s2d.apply(variables, dep, train=False)
    # all pools are 0, so the features reduce to biases through relus —
    # bounded O(1); a sentinel leak would inject values around 1000.
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32)))) < 50.0


def test_heads_zero_init_off_aff():
    cfg = Config(zero_init_aff=True).finalize()
    rng = np.random.default_rng(0)
    fd2fe2 = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    fe1 = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    heads = Heads(cfg)
    variables = heads.init(jax.random.PRNGKey(1), fd2fe2, fe1, train=False)
    _, off_aff, _ = heads.apply(variables, fd2fe2, fe1, train=False)
    np.testing.assert_array_equal(np.asarray(off_aff), 0.0)
