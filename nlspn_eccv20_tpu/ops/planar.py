"""Planar-layout channel ops for tiny-channel stages.

On TPU an NHWC tensor pads its minor (channel) dimension to the 128-lane
width, so full-resolution 6/8/16-channel tensors (the S2D pyramid stage,
reference nlspnmodel.py:406-462) cost up to 21x their logical bytes. These
helpers keep such stages in PLANAR (B, K, H, W) layout, where the tiled
dims are (H, W) and channel counts are free.

``planar_channel_mlp`` is the S2D 1x1-conv pair (relu(W0.x+b0) ->
relu(W1.h+b1)) with a custom VJP: the forward is scalar-weighted plane
sums (one fused elementwise pass — exactly what XLA produces), while the
backward computes the weight gradients as single batched contractions.
Plain autodiff of the scalar-sum form emits one full-plane reduction per
scalar weight (176 separate kernels for 6->8->16), measured ~6x slower
than the whole rest of S2D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _affine_relu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """relu(w^T x + b) over planar channels. x: (B, K, H, W); w: (K, C)."""
    k_in, c_out = w.shape
    planes = [
        sum(w[k, c] * x[:, k] for k in range(k_in)) + b[c]
        for c in range(c_out)
    ]
    return jax.nn.relu(jnp.stack(planes, axis=1))


def _plane_dot(a: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dW[k, c] = sum_bhw a[:, k] * g[:, c] as one batched contraction."""
    return jnp.einsum("bkhw,bchw->kc", a, g)


@jax.custom_vjp
def planar_channel_mlp(x, w0, b0, w1, b1):
    """x: (B, K0, H, W) -> (B, C1, H, W) via two 1x1 "convs" with relu."""
    return _mlp_fwd(x, w0, b0, w1, b1)[0]


def _mlp_fwd(x, w0, b0, w1, b1):
    h0 = _affine_relu(x, w0, b0)
    h1 = _affine_relu(h0, w1, b1)
    return h1, (x, h0, h1, w0, w1)


def _mlp_bwd(res, g):
    x, h0, h1, w0, w1 = res
    g1 = jnp.where(h1 > 0, g, 0.0)
    dw1 = _plane_dot(h0, g1)
    db1 = jnp.sum(g1, axis=(0, 2, 3))
    # grad to h0: sum_c w1[k, c] * g1[:, c], then relu mask — plane sums
    # (same fused-elementwise shape as the forward).
    k0, c0 = w0.shape
    g0 = jnp.stack(
        [sum(w1[k, c] * g1[:, c] for c in range(w1.shape[1]))
         for k in range(c0)], axis=1)
    g0 = jnp.where(h0 > 0, g0, 0.0)
    dw0 = _plane_dot(x, g0)
    db0 = jnp.sum(g0, axis=(0, 2, 3))
    dx = jnp.stack(
        [sum(w0[k, c] * g0[:, c] for c in range(c0)) for k in range(k0)],
        axis=1)
    return dx, dw0, db0, dw1, db1


planar_channel_mlp.defvjp(_mlp_fwd, _mlp_bwd)
