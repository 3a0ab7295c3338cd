"""Unit tests for the small-output 3x3 conv Pallas op (op-library primitive;
not wired into the model — see the module docstring for the measured
in-model outcome)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nlspn_eccv20_tpu.ops.pallas.small_conv3x3 as sc


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(sc, "FORCE_PALLAS_INTERPRET", True)


def _rand(rng, b, h, w, ca, cb, k):
    xa = jnp.asarray(rng.standard_normal((b, h, w, ca)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((b, h, w, cb)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, ca + cb, k)) * 0.1,
                     jnp.float32)
    bb = jnp.asarray(rng.standard_normal((k,)) * 0.1, jnp.float32)
    return xa, xb, wt, bb


@pytest.mark.parametrize("shape", [
    (2, 16, 24, 16, 8, 10),
    (1, 9, 31, 8, 8, 4),       # odd sizes
])
def test_forward_matches_reference(shape):
    rng = np.random.default_rng(0)
    args = _rand(rng, *shape)
    ref = sc.small_conv3x3_reference(*args)
    out = sc._fwd_pallas(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(1)
    args = _rand(rng, 2, 16, 24, 16, 8, 10)
    g = jnp.asarray(rng.standard_normal((2, 10, 16, 24)), jnp.float32)

    def loss_p(*a):
        return jnp.vdot(sc.small_conv3x3_planar(*a), g)

    def loss_r(*a):
        return jnp.vdot(sc.small_conv3x3_reference(*a), g)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(*args)
    for name, a, b in zip(["dxa", "dxb", "dw", "db"], gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient {name} mismatch")
