"""Unit tests for the fused decode_aff tail Pallas kernel.

The op (ops/pallas/dec_aff_tail.py) must match the pure-JAX composition
deconv2(relu(deconv1(x))) — the exact math of the module path in
models/nlspn.DecodeAff — in both forward and all five gradients. On the CPU
test backend the Pallas path runs in interpreter mode (exact f32 semantics),
so tolerances are tight.

Also checks that the fused model path (fused_kernels='on' with the
interpreted kernel) produces the same params and outputs as the module path
(fused_kernels='off').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nlspn_eccv20_tpu.ops.pallas.dec_aff_tail as dat


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(dat, "FORCE_PALLAS_INTERPRET", True)


def _rand_op_inputs(rng, b, hg, wg, c, m, k, zero_w2=False):
    x = jnp.asarray(rng.standard_normal((b, hg, wg, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, m)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((m,)) * 0.1, jnp.float32)
    if zero_w2:
        w2 = jnp.zeros((3, 3, m, k), jnp.float32)
        b2 = jnp.zeros((k,), jnp.float32)
    else:
        w2 = jnp.asarray(rng.standard_normal((3, 3, m, k)) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((k,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("shape", [
    (2, 6, 10, 16, 16, 8),     # single tile
    (1, 5, 9, 8, 16, 4),       # odd sizes, small K
    (1, 4, 130, 8, 16, 8),     # multi-tile (130 cols -> tiled)
])
def test_forward_matches_reference(shape):
    rng = np.random.default_rng(0)
    args = _rand_op_inputs(rng, *shape)
    ref = dat.decode_aff_tail_reference(*args)
    out = dat._fwd_pallas(*args)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_zero_weights_gives_bias():
    rng = np.random.default_rng(1)
    args = _rand_op_inputs(rng, 1, 6, 10, 16, 16, 8, zero_w2=True)
    out = dat._fwd_pallas(*args)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.parametrize("shape", [
    (2, 6, 10, 16, 16, 8),
    (1, 4, 130, 8, 16, 8),     # multi-tile: halo-overlap dx stitching
])
def test_gradients_match_reference(shape):
    rng = np.random.default_rng(2)
    args = _rand_op_inputs(rng, *shape)
    g = jnp.asarray(rng.standard_normal(
        (shape[0], shape[5], 4 * shape[1], 4 * shape[2])), jnp.float32)

    def loss_p(*a):
        return jnp.vdot(dat.decode_aff_tail(*a), g)

    def loss_r(*a):
        return jnp.vdot(dat.decode_aff_tail_reference(*a), g)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["dx", "dw1", "db1", "dw2", "db2"], gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient {name} mismatch")


def test_phase_tables_cover_all_taps():
    # deconv1: each tap appears exactly once; (phase, shift) pairs unique.
    plc1 = dat._deconv1_placement()
    assert sorted(t for _, t, _ in plc1) == list(range(9))
    assert len({(p, s) for p, _, s in plc1}) == len(plc1)
    # composed: 36 contributions, unique (ab, p2, shift) triples, all 16
    # output phases covered.
    plc2 = dat._deconv2_placement()
    assert len(plc2) == 36
    assert len({(ab, p2, s) for ab, p2, _, s in plc2}) == 36
    assert {ab for ab, *_ in plc2} == set(range(16))


def test_model_paths_agree():
    """fused_kernels='on' (interpreted kernel) == 'off' (module convs),
    same param tree."""
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
        outs.append(model.apply(variables, sample, train=False))
        trees.append(jax.tree_util.tree_structure(variables))
    assert trees[0] == trees[1]
    np.testing.assert_allclose(np.asarray(outs[0]["pred"]),
                               np.asarray(outs[1]["pred"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[0]["aff"]),
                               np.asarray(outs[1]["aff"]),
                               rtol=1e-4, atol=1e-5)
