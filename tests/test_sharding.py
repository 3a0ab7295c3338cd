"""Multi-device data-parallel tests on the virtual 8-device CPU mesh.

Exercises the pjit/mesh path without TPU hardware (SURVEY.md section 4):
global-batch train step with batch sharded over Mesh(('data',)), parameter
replication, implicit gradient allreduce, and sync-BN semantics (global
batch statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.parallel import make_mesh, batch_sharding, replicate, shard_batch
from nlspn_eccv20_tpu.train import Engine


def _batch(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.clip(rng.random((b, h, w, 1)) * 8, 0, None).astype(np.float32)
    return {
        "rgb": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "dep": (gt * (rng.random((b, h, w, 1)) > 0.9)).astype(np.float32),
        "gt": gt,
        "K": np.tile(np.asarray([50.0, 50.0, w / 2, h / 2], np.float32), (b, 1)),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = _batch(8, 16, 24)
    placed = shard_batch(mesh, batch)
    shards = placed["rgb"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 16, 24, 3)


def test_train_step_sharded_runs_and_matches_single_device():
    cfg = Config(data_name="Synthetic", patch_height=16, patch_width=24,
                 prop_time=2, batch_size=8, prop_impl="xla",
                 use_GRU=False).finalize()
    batch = _batch(8, 16, 24)

    # 8-device sharded run
    eng8 = Engine(cfg, steps_per_epoch=4)
    state8 = eng8.init_state((16, 24))
    step8 = eng8.train_step_fn()
    s8, aux8 = step8(state8, eng8.put_train_batch(batch))
    loss8 = float(jax.device_get(aux8["loss"]))

    # single-device run with identical init (same PRNG seed)
    eng1 = Engine(cfg.replace(num_data_shards=1), steps_per_epoch=4)
    state1 = eng1.init_state((16, 24))
    step1 = eng1.train_step_fn()
    s1, aux1 = step1(state1, eng1.put_train_batch(batch))
    loss1 = float(jax.device_get(aux1["loss"]))

    # global-batch semantics: sharding must not change the math
    np.testing.assert_allclose(loss8, loss1, rtol=1e-4)
    p8 = jax.device_get(jax.tree.leaves(s8.params)[0])
    p1 = jax.device_get(jax.tree.leaves(s1.params)[0])
    np.testing.assert_allclose(p8, p1, rtol=1e-3, atol=1e-5)


def test_batch_stats_are_global_sync_bn():
    """BN statistics must reflect the GLOBAL batch (sync-BN), not per-shard."""
    cfg = Config(patch_height=16, patch_width=24, prop_time=1,
                 batch_size=8, use_GRU=False, use_S2D=False, conf_prop=False,
                 prop_impl="xla").finalize()
    eng = Engine(cfg, steps_per_epoch=1)
    state = eng.init_state((16, 24))
    step = eng.train_step_fn()

    # batch where shard means differ wildly: if BN were per-shard, running
    # stats would differ from the global computation.
    batch = _batch(8, 16, 24)
    batch["rgb"][:4] += 10.0
    s_sharded, _ = step(state, eng.put_train_batch(batch))

    eng1 = Engine(cfg.replace(num_data_shards=1), steps_per_epoch=1)
    state1 = eng1.init_state((16, 24))
    step1 = eng1.train_step_fn()
    s_single, _ = step1(state1, eng1.put_train_batch(batch))

    bs_a = jax.device_get(jax.tree.leaves(s_sharded.batch_stats))
    bs_b = jax.device_get(jax.tree.leaves(s_single.batch_stats))
    for a, b in zip(bs_a, bs_b):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_eval_replicated():
    cfg = Config(patch_height=16, patch_width=24, prop_time=2,
                 prop_impl="xla").finalize()
    eng = Engine(cfg, steps_per_epoch=1)
    state = eng.init_state((16, 24))
    ev = eng.eval_step_fn()
    res = ev(state, eng.put_eval_batch(_batch(1, 16, 24)))
    m = np.asarray(res["metric"])
    assert m.shape == (1, 8) and np.isfinite(m).all()
