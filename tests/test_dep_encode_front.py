"""Unit tests for the fused encode_dep front Pallas kernel.

Must match the pure-JAX composition relu(conv1(relu(conv0(x)))) — the exact
math of the module path in models/nlspn.EncodeDep — in forward and all five
gradients. Interpreter mode on the CPU test backend gives exact f32
semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nlspn_eccv20_tpu.ops.pallas.dep_encode_front as def_


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(def_, "FORCE_PALLAS_INTERPRET", True)


def _rand_inputs(rng, b, h, w, m, c1):
    xp = jnp.asarray(rng.standard_normal((b, h, w)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 1, m)) * 0.3, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((m,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, m, c1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32)
    return xp, w0, b0, w1, b1


@pytest.mark.parametrize("shape", [
    (2, 24, 40, 16, 32),     # single tile
    (1, 16, 24, 16, 8),      # tiny
    (1, 8, 560, 16, 16),     # multi-tile (grid width 140 -> tiled)
])
def test_forward_matches_reference(shape):
    rng = np.random.default_rng(0)
    args = _rand_inputs(rng, *shape)
    ref = def_.dep_encode_front_reference(*args)
    out = def_._fwd_pallas(*args, jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [
    (2, 24, 40, 16, 32),
    (1, 8, 560, 16, 16),     # multi-tile: overlap-summed dx stitching
])
def test_gradients_match_reference(shape):
    rng = np.random.default_rng(1)
    args = _rand_inputs(rng, *shape)
    b, h, w, m, c1 = shape
    g = jnp.asarray(rng.standard_normal((b, h // 4, w // 4, c1)),
                    jnp.float32)

    def loss_p(*a):
        return jnp.vdot(def_.dep_encode_front(*a, jnp.float32), g)

    def loss_r(*a):
        return jnp.vdot(def_.dep_encode_front_reference(*a), g)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, bb in zip(["dx", "dw0", "db0", "dw1", "db1"], gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient {name} mismatch")


def test_placements_cover_all_taps():
    plc0 = def_._conv0_placement()
    assert len(plc0) == 36
    # each (x-phase, out-phase) pair used at most once per shift
    assert len({(xp, op, s) for xp, op, _, s in plc0}) == 36
    plc1 = def_._conv1_placement()
    assert sorted(t for _, t, _ in plc1) == list(range(9))
    assert len({(p, s) for p, _, s in plc1}) == 9


def test_model_paths_agree():
    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.models import get_model

    rng = np.random.default_rng(3)
    h, w = 16, 24
    sample = {
        "rgb": jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32),
        "dep": jnp.asarray((rng.random((1, h, w, 1)) > 0.8) * 3.0,
                           jnp.float32),
    }
    outs, trees = [], []
    for mode in ("on", "off"):
        cfg = Config(data_name="Synthetic", patch_height=h, patch_width=w,
                     prop_time=2, fused_kernels=mode).finalize()
        model = get_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), sample, train=False)
        # noise the params so zero-init heads produce nonzero activity
        leaves, treedef = jax.tree_util.tree_flatten(variables)
        key = jax.random.PRNGKey(1)
        leaves = [l + 0.05 * jax.random.normal(jax.random.fold_in(key, i),
                                               l.shape, l.dtype)
                  for i, l in enumerate(leaves)]
        variables = jax.tree_util.tree_unflatten(treedef, leaves)
        outs.append(model.apply(variables, sample, train=False))
        trees.append(jax.tree_util.tree_structure(variables))
    assert trees[0] == trees[1]
    np.testing.assert_allclose(np.asarray(outs[0]["pred"]),
                               np.asarray(outs[1]["pred"]),
                               rtol=1e-4, atol=1e-5)
