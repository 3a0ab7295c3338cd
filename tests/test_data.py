"""Data pipeline tests: transforms, sparse sampling, loader, synthetic set."""

import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.data import get_dataset, get_sparse_depth
from nlspn_eccv20_tpu.data import transforms as T
from nlspn_eccv20_tpu.data.loader import DataLoader


class TestSparseDepth:
    def test_exact_sample_count(self):
        rng = np.random.default_rng(0)
        dep = rng.random((40, 50, 1)).astype(np.float32) + 0.1
        sp = get_sparse_depth(dep, 123, rng)
        assert (sp > 0).sum() == 123
        m = sp > 0
        np.testing.assert_array_equal(sp[m], dep[m])

    def test_fewer_valid_than_requested(self):
        rng = np.random.default_rng(0)
        dep = np.zeros((10, 10, 1), np.float32)
        dep[0, :5, 0] = 1.0
        sp = get_sparse_depth(dep, 100, rng)
        assert (sp > 0).sum() == 5


class TestTransforms:
    def test_resize_short_side(self):
        img = T.to_pil_rgb(np.zeros((480, 640, 3)))
        out = T.resize_short_side(img, 240, "bilinear")
        assert out.size == (320, 240)  # PIL size is (W, H)

    def test_center_crop(self):
        img = T.to_pil_rgb(np.zeros((240, 320, 3)))
        out = T.center_crop(img, (228, 304))
        assert out.size == (304, 228)

    def test_normalize_roundtrip(self):
        arr = np.full((4, 4, 3), 128, np.uint8)
        out = T.rgb_to_normalized(T.to_pil_rgb(arr))
        expect = (128 / 255.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD
        np.testing.assert_allclose(out[0, 0], expect, rtol=1e-5)

    def test_depth_rotation_preserves_values(self):
        """NEAREST rotation must not interpolate depth values."""
        rng = np.random.default_rng(0)
        vals = np.asarray([0.0, 1.0, 2.0, 5.0], np.float32)
        dep = vals[rng.integers(0, 4, (64, 64))].astype(np.float32)
        rot = np.asarray(T.rotate(T.to_pil_depth(dep), 5.0, "nearest"))
        assert set(np.unique(rot)).issubset(set(vals.tolist()))

    def test_hflip(self):
        arr = np.arange(12, dtype=np.float32).reshape(2, 6)
        out = np.asarray(T.hflip(T.to_pil_depth(arr)))
        np.testing.assert_array_equal(out, arr[:, ::-1])


class TestSynthetic:
    def _cfg(self):
        return Config(data_name="Synthetic", patch_height=32, patch_width=48,
                      num_sample=50).finalize()

    def test_shapes_and_determinism(self):
        ds = get_dataset(self._cfg(), "train")
        rng = np.random.default_rng(1)
        s1 = ds.__getitem__(0, np.random.default_rng(1))
        s2 = ds.__getitem__(0, np.random.default_rng(1))
        assert s1["rgb"].shape == (32, 48, 3)
        assert s1["dep"].shape == (32, 48, 1)
        assert s1["gt"].shape == (32, 48, 1)
        assert s1["K"].shape == (4,)
        np.testing.assert_array_equal(s1["dep"], s2["dep"])
        assert (s1["dep"] > 0).sum() == 50

    def test_splits_disjoint_scenes(self):
        cfg = self._cfg()
        tr = get_dataset(cfg, "train")
        te = get_dataset(cfg, "test")
        r = np.random.default_rng(0)
        a = tr.__getitem__(0, r)
        b = te.__getitem__(0, np.random.default_rng(0))
        assert not np.allclose(a["gt"], b["gt"])


class TestLoader:
    def _ds(self):
        return get_dataset(
            Config(data_name="Synthetic", patch_height=16, patch_width=24,
                   num_sample=20).finalize(), "train")

    def test_batching(self):
        dl = DataLoader(self._ds(), 4, shuffle=True, drop_last=True, seed=0)
        batches = list(dl)
        assert len(batches) == len(dl) == 8
        assert batches[0]["rgb"].shape == (4, 16, 24, 3)
        assert batches[0]["dep"].dtype == np.float32

    def test_epoch_determinism_and_reshuffle(self):
        dl = DataLoader(self._ds(), 4, shuffle=True, drop_last=True, seed=0)
        dl.set_epoch(1)
        a = list(dl)
        dl.set_epoch(1)
        b = list(dl)
        np.testing.assert_array_equal(a[0]["gt"], b[0]["gt"])
        dl.set_epoch(2)
        c = list(dl)
        assert not np.allclose(a[0]["gt"], c[0]["gt"])

    def test_sharding_partitions_epoch(self):
        ds = self._ds()
        seen = []
        for shard in range(2):
            dl = DataLoader(ds, 4, shuffle=False, drop_last=False, seed=0,
                            shard_index=shard, num_shards=2)
            for batch in dl:
                seen.append(batch["gt"])
        total = sum(b.shape[0] for b in seen)
        assert total == len(ds)  # 32 samples over 2 shards, no overlap loss

    def test_drop_last_false_partial_batch(self):
        dl = DataLoader(self._ds(), 5, shuffle=False, drop_last=False, seed=0)
        sizes = [b["rgb"].shape[0] for b in dl]
        assert sizes == [5, 5, 5, 5, 5, 5, 2]

    def test_early_exit_unblocks_producer(self):
        """Breaking out of iteration mid-epoch must not leave the producer
        thread parked in a full queue (it would leak a thread pool per
        abandoned iterator)."""
        import threading

        before = threading.active_count()
        for _ in range(4):
            it = iter(DataLoader(self._ds(), 2, shuffle=False, seed=0,
                                 prefetch=1))
            next(it)
            it.close()  # generator close -> finally -> drain + join
        # allow a short grace period for thread teardown
        import time

        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before, (
            threading.active_count(), before)


class TestOptimSchedule:
    def test_piecewise_decay_and_warmup(self):
        from nlspn_eccv20_tpu.utils.optim import make_lr_schedule

        cfg = Config(lr=0.001, decay="10,15,20", gamma="1.0,0.2,0.04",
                     warm_up=True, epochs=20).finalize()
        spe = 10
        sched = make_lr_schedule(cfg, spe)
        # warmup within epoch 1: ramps to lr
        assert float(sched(0)) == pytest.approx(0.001 * 1 / 10)
        assert float(sched(9)) == pytest.approx(0.001)
        # epochs 2..9 flat
        assert float(sched(5 * spe)) == pytest.approx(0.001)
        # epoch 11 (step 100..109): first boundary with epoch<15 -> 0.2
        assert float(sched(10 * spe)) == pytest.approx(0.001 * 0.2)
        # epoch 16: 0.04
        assert float(sched(15 * spe)) == pytest.approx(0.001 * 0.04)
        # past the last boundary: stays at last gamma
        assert float(sched(25 * spe)) == pytest.approx(0.001 * 0.04)

    def test_no_warmup(self):
        from nlspn_eccv20_tpu.utils.optim import make_lr_schedule

        cfg = Config(lr=0.01, warm_up=False).finalize()
        sched = make_lr_schedule(cfg, 10)
        assert float(sched(0)) == pytest.approx(0.01)
