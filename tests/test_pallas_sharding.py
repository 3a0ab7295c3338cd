"""Pallas kernels must self-partition over the data mesh.

A Pallas kernel lowers to an opaque custom call GSPMD cannot split: under
a batch sharded over ``Mesh(('data',))`` XLA inserts an all-gather and
every device computes the full global batch. ``ops/pallas/shard.py`` fixes
this by wrapping each kernel in ``jax.shard_map`` over the ambient data
mesh (set by ``train.Engine`` around its jitted steps). These tests pin,
on the virtual 8-device CPU mesh with interpreted kernels:

  * without the ambient mesh, the compiled HLO really does all-gather
    (the failure mode exists — if a jax upgrade makes GSPMD handle the
    custom call natively, this test tells us the wrapper can go);
  * with it, the all-gather is gone and the batch stays sharded;
  * outputs and weight gradients match the unsharded op (the psum for
    replicated-weight cotangents is inserted by shard_map's transpose);
  * indivisible batches fall back to the plain path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P, set_mesh

import nlspn_eccv20_tpu.ops.pallas.dec_aff_tail as dat
import nlspn_eccv20_tpu.ops.pallas.dep_encode_front as dfr
import nlspn_eccv20_tpu.ops.pallas.local_prop as lp
from nlspn_eccv20_tpu.ops.pallas.shard import ambient_data_mesh


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(dat, "FORCE_PALLAS_INTERPRET", True)
    monkeypatch.setattr(dfr, "FORCE_PALLAS_INTERPRET", True)


@pytest.fixture()
def mesh():
    return Mesh(np.asarray(jax.devices()), ("data",))


def _sharded(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def _dec_aff_inputs(b=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 8, 10, 32)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 32, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_unwrapped_op_allgathers(mesh):
    """The failure mode this module exists for: the raw custom-vjp core
    under a sharded batch compiles to an all-gather + replicated output."""
    x, w1, b1, w2, b2 = _dec_aff_inputs()
    xs = _sharded(mesh, x)
    comp = (jax.jit(dat._decode_aff_tail_core)
            .lower(xs, w1, b1, w2, b2).compile())
    assert "all-gather" in comp.as_text()
    assert comp.output_shardings.spec == P()


def test_dec_aff_tail_shards_and_matches(mesh):
    x, w1, b1, w2, b2 = _dec_aff_inputs()
    xs = _sharded(mesh, x)
    ref = dat.decode_aff_tail_reference(x, w1, b1, w2, b2)

    with set_mesh(mesh):
        comp = (jax.jit(dat.decode_aff_tail)
                .lower(xs, w1, b1, w2, b2).compile())
        txt = comp.as_text()
        assert "all-gather" not in txt
        assert comp.output_shardings.spec[0] == "data"  # batch stays sharded
        out = jax.jit(dat.decode_aff_tail)(xs, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dec_aff_tail_sharded_grads_match(mesh):
    x, w1, b1, w2, b2 = _dec_aff_inputs()
    xs = _sharded(mesh, x)

    def loss(op):
        def f(x, w1, b1, w2, b2):
            y = op(x, w1, b1, w2, b2)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size,
                                                  dtype=jnp.float32)
                                       .reshape(y.shape)))
        return f

    g_ref = jax.grad(loss(dat.decode_aff_tail_reference),
                     argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    with set_mesh(mesh):
        g = jax.jit(jax.grad(loss(dat.decode_aff_tail),
                             argnums=(0, 1, 2, 3, 4)))(xs, w1, b1, w2, b2)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_dep_encode_front_shards_and_matches(mesh):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 16, 24)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 1, 16)) * 0.2, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    ref = dfr.dep_encode_front_reference(x, w0, b0, w1, b1)
    xs = _sharded(mesh, x)
    with set_mesh(mesh):
        f = jax.jit(lambda *a: dfr.dep_encode_front(*a, dt=jnp.float32))
        comp = f.lower(xs, w0, b0, w1, b1).compile()
        assert "all-gather" not in comp.as_text()
        out = f(xs, w0, b0, w1, b1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prop_step_shards_and_matches(mesh):
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.random((8, 12, 16)), jnp.float32)
    conf = jnp.asarray(rng.random((8, 12, 16)), jnp.float32)
    dep = jnp.asarray((rng.random((8, 12, 16)) > 0.9) * 2.0, jnp.float32)
    aff = jnp.asarray(rng.standard_normal((8, 9, 12, 16)) * 0.1, jnp.float32)
    ref = lp.fused_prop_step_planar(pred, aff, conf=conf, dep=dep,
                                    preserve=True, clip=True)
    ps, cs, ds, as_ = (_sharded(mesh, t) for t in (pred, conf, dep, aff))
    with set_mesh(mesh):
        f = jax.jit(lambda p, a, c, d: lp.fused_prop_step_planar(
            p, a, conf=c, dep=d, preserve=True, clip=True))
        comp = f.lower(ps, as_, cs, ds).compile()
        assert "all-gather" not in comp.as_text()
        out = f(ps, as_, cs, ds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_prop_loop_shards_and_matches(mesh):
    rng = np.random.default_rng(3)
    pred = jnp.asarray(rng.random((8, 12, 16, 1)), jnp.float32)
    aff = jnp.asarray(rng.standard_normal((8, 12, 16, 9)) * 0.08, jnp.float32)
    ref = lp.propagate_loop_pallas(pred, aff, steps=3)
    ps, as_ = _sharded(mesh, pred), _sharded(mesh, aff)
    with set_mesh(mesh):
        f = jax.jit(lambda p, a: lp.propagate_loop_pallas(p, a, steps=3))
        comp = f.lower(ps, as_).compile()
        assert "all-gather" not in comp.as_text()
        out = f(ps, as_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_indivisible_batch_falls_back(mesh):
    x, w1, b1, w2, b2 = _dec_aff_inputs(b=3)  # 3 % 8 != 0
    ref = dat.decode_aff_tail_reference(x, w1, b1, w2, b2)
    with set_mesh(mesh):
        assert ambient_data_mesh(3) is None
        out = jax.jit(dat.decode_aff_tail)(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_no_ambient_mesh_is_plain_call():
    x, w1, b1, w2, b2 = _dec_aff_inputs()
    assert ambient_data_mesh(8) is None  # nothing set
    ref = dat.decode_aff_tail_reference(x, w1, b1, w2, b2)
    out = jax.jit(dat.decode_aff_tail)(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_engine_step_under_mesh_with_fused_kernels():
    """End-to-end: Engine's jitted train step, fused kernels interpreted,
    batch sharded over 2 devices — compiles, runs, loss finite, and the
    fused ops' custom calls are not all-gathered."""
    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.train import Engine

    cfg = Config(data_name="Synthetic", patch_height=16, patch_width=24,
                 batch_size=2, prop_time=2, fused_kernels="on",
                 num_data_shards=2).finalize()
    eng = Engine(cfg, steps_per_epoch=4)
    state = eng.init_state((16, 24))
    rng = np.random.default_rng(0)
    gt = np.clip(rng.random((2, 16, 24, 1)) * 8, 0.1, None).astype(np.float32)
    batch = {
        "rgb": rng.standard_normal((2, 16, 24, 3)).astype(np.float32),
        "dep": (gt * (rng.random((2, 16, 24, 1)) > 0.7)).astype(np.float32),
        "gt": gt,
    }
    placed = eng.put_train_batch(batch)
    step = eng.train_step_fn()
    state, aux = step(state, placed)
    assert np.isfinite(float(aux["loss"]))
