"""Dataset tooling tests (reference utils/ parity, SURVEY.md section 2.4):
split-JSON generators for NYU + KITTI DC and the KITTI raw->DC copier, run
against tiny synthetic directory trees."""

import json
import os
import sys

import pytest


def _run_main(module, argv):
    old = sys.argv
    sys.argv = ["tool"] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def _touch(path, data=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


class TestGenerateJsonNYU:
    def test_split_and_ratio(self, tmp_path):
        from nlspn_eccv20_tpu.tools import generate_json_nyu

        root = tmp_path / "nyu"
        for scene in ("kitchen_0001", "office_0002"):
            for i in range(10):
                _touch(str(root / "train" / scene / f"{i:05d}.h5"))
        for i in range(4):
            _touch(str(root / "val" / "official" / f"{i:05d}.h5"))

        out = tmp_path / "nyu.json"
        _run_main(generate_json_nyu,
                  ["--path_root", str(root), "--path_out", str(out),
                   "--val_ratio", "0.1"])
        data = json.loads(out.read_text())
        assert len(data["val"]) == 2  # 10% of 20
        assert len(data["train"]) == 18
        assert len(data["test"]) == 4
        # train/val disjoint; paths relative to root
        tr = {e["filename"] for e in data["train"]}
        vl = {e["filename"] for e in data["val"]}
        assert not tr & vl
        assert all(not f.startswith("/") for f in tr | vl)
        assert all(os.path.exists(root / e["filename"])
                   for e in data["train"] + data["val"] + data["test"])

    def test_deterministic_seed(self, tmp_path):
        from nlspn_eccv20_tpu.tools import generate_json_nyu

        root = tmp_path / "nyu"
        for i in range(20):
            _touch(str(root / "train" / "s" / f"{i:05d}.h5"))
        outs = []
        for name in ("a.json", "b.json"):
            out = tmp_path / name
            _run_main(generate_json_nyu,
                      ["--path_root", str(root), "--path_out", str(out),
                       "--seed", "7240"])
            outs.append(out.read_text())
        assert outs[0] == outs[1]


def _make_kitti_dc(root, split, seq="2011_09_26_drive_0001_sync", n=3):
    base = os.path.join(root, split, seq)
    for cam in ("image_02", "image_03"):
        for i in range(n):
            fn = f"{i:010d}.png"
            _touch(os.path.join(base, "proj_depth", "groundtruth", cam, fn))
            _touch(os.path.join(base, "proj_depth", "velodyne_raw", cam, fn))
            _touch(os.path.join(base, cam, "data", fn))


class TestGenerateJsonKITTI:
    def test_train_val_test(self, tmp_path):
        from nlspn_eccv20_tpu.tools import generate_json_kitti_dc

        root = str(tmp_path / "kitti")
        _make_kitti_dc(root, "train")
        _make_kitti_dc(root, "val", seq="2011_09_28_drive_0002_sync", n=2)
        sel = os.path.join(root, "depth_selection", "val_selection_cropped")
        for i in range(2):
            fn = f"2011_09_26_drive_0005_sync_image_{i:010d}_image_02.png"
            _touch(os.path.join(sel, "image", fn))
            _touch(os.path.join(sel, "velodyne_raw",
                                fn.replace("image", "velodyne_raw")))
            _touch(os.path.join(sel, "groundtruth_depth",
                                fn.replace("image", "groundtruth_depth")))
            _touch(os.path.join(sel, "intrinsics", fn[:-4] + ".txt"))

        out = tmp_path / "kitti_dc.json"
        _run_main(generate_json_kitti_dc,
                  ["--path_root", root, "--path_out", str(out)])
        data = json.loads(out.read_text())
        assert len(data["train"]) == 6   # 3 frames x 2 cams
        assert len(data["val"]) == 4
        assert len(data["test"]) == 2
        e = data["train"][0]
        assert set(e) == {"rgb", "depth", "gt", "K"}
        for k in ("rgb", "depth", "gt"):
            assert os.path.exists(os.path.join(root, e[k])), e[k]
        assert e["K"].endswith("calib_cam_to_cam.txt")

    def test_test_data_mode(self, tmp_path):
        from nlspn_eccv20_tpu.tools import generate_json_kitti_dc

        root = str(tmp_path / "kitti")
        base = os.path.join(root, "depth_selection",
                            "test_depth_completion_anonymous")
        for i in range(3):
            fn = f"{i:010d}.png"
            _touch(os.path.join(base, "image", fn))
            _touch(os.path.join(base, "velodyne_raw", fn))
            _touch(os.path.join(base, "intrinsics", fn[:-4] + ".txt"))
        out = tmp_path / "kitti_dc_test.json"
        _run_main(generate_json_kitti_dc,
                  ["--path_root", root, "--path_out", str(out), "--test_data"])
        data = json.loads(out.read_text())
        # reference online-test json carries only the 'test' key
        # (generate_json_KITTI_DC.py:177-222)
        assert set(data) == {"test"}
        assert len(data["test"]) == 3
        # anonymous split has no gt: gt falls back to the sparse depth
        assert data["test"][0]["gt"] == data["test"][0]["depth"]


class TestPrepareKITTI:
    def test_copies_rgb_oxts_calib(self, tmp_path):
        from nlspn_eccv20_tpu.tools import prepare_kitti_dc

        dc = str(tmp_path / "dc")
        raw = str(tmp_path / "raw")
        seq = "2011_09_26_drive_0001_sync"
        _touch(os.path.join(dc, "train", seq, "proj_depth", "groundtruth",
                            "image_02", "0000000000.png"))
        for sub in ("image_02", "image_03", "oxts"):
            _touch(os.path.join(raw, "2011_09_26", seq, sub, "data",
                                "0000000000.bin"))
        for cf in prepare_kitti_dc.CALIB_FILES:
            _touch(os.path.join(raw, "2011_09_26", cf))

        _run_main(prepare_kitti_dc, ["--path_dc", dc, "--path_raw", raw])
        for sub in ("image_02", "image_03", "oxts"):
            assert os.path.isdir(os.path.join(dc, "train", seq, sub)), sub
        # calib lands inside each sequence dir (reference
        # prepare_KITTI_DC.py:85-90 layout)
        for cf in prepare_kitti_dc.CALIB_FILES:
            assert os.path.isfile(os.path.join(dc, "train", seq, cf)), cf

    def test_dry_run_copies_nothing(self, tmp_path):
        from nlspn_eccv20_tpu.tools import prepare_kitti_dc

        dc = str(tmp_path / "dc")
        raw = str(tmp_path / "raw")
        seq = "2011_09_26_drive_0001_sync"
        _touch(os.path.join(dc, "train", seq, "proj_depth", "groundtruth",
                            "image_02", "0000000000.png"))
        _touch(os.path.join(raw, "2011_09_26", seq, "image_02", "data",
                            "0000000000.bin"))
        n = prepare_kitti_dc.prepare_split(dc, raw, "train", dry_run=True)
        assert n == 1
        assert not os.path.isdir(os.path.join(dc, "train", seq, "image_02"))

    def test_round_trip_prepare_generate_load(self, tmp_path):
        """prepare -> generate_json -> KITTIDC dataset loads (interop check:
        the K path written by the generator must resolve against the tree
        built by the prep tool, reference layout)."""
        import numpy as np
        from PIL import Image

        from nlspn_eccv20_tpu.config import Config
        from nlspn_eccv20_tpu.data import get_dataset
        from nlspn_eccv20_tpu.tools import generate_json_kitti_dc, prepare_kitti_dc

        dc = str(tmp_path / "dc")
        raw = str(tmp_path / "raw")
        seq = "2011_09_26_drive_0001_sync"
        rng = np.random.default_rng(0)
        base = os.path.join(dc, "train", seq)
        for i in range(2):
            fn = f"{i:010d}.png"
            gt = (rng.random((60, 100)) * 80 * 256).astype(np.uint16)
            os.makedirs(os.path.join(base, "proj_depth", "groundtruth",
                                     "image_02"), exist_ok=True)
            os.makedirs(os.path.join(base, "proj_depth", "velodyne_raw",
                                     "image_02"), exist_ok=True)
            Image.fromarray(gt).save(os.path.join(
                base, "proj_depth", "groundtruth", "image_02", fn))
            Image.fromarray((gt * (rng.random((60, 100)) > 0.9)).astype(
                np.uint16)).save(os.path.join(
                    base, "proj_depth", "velodyne_raw", "image_02", fn))
            os.makedirs(os.path.join(raw, "2011_09_26", seq, "image_02",
                                     "data"), exist_ok=True)
            Image.fromarray(rng.integers(0, 256, (60, 100, 3),
                                         dtype=np.uint8)).save(
                os.path.join(raw, "2011_09_26", seq, "image_02", "data", fn))
        P = ("7.2e+02 0.0 6.0e+01 4.4e+01 0.0 7.2e+02 4.7e+01 2.1e-01 "
             "0.0 0.0 1.0 2.7e-03")
        with open(os.path.join(raw, "2011_09_26", "calib_cam_to_cam.txt"),
                  "w") as f:
            f.write(f"P_rect_02: {P}\nP_rect_03: {P}\n")
        for cf in ("calib_imu_to_velo.txt", "calib_velo_to_cam.txt"):
            _touch(os.path.join(raw, "2011_09_26", cf))

        _run_main(prepare_kitti_dc, ["--path_dc", dc, "--path_raw", raw])
        out = str(tmp_path / "kitti_dc.json")
        _run_main(generate_json_kitti_dc,
                  ["--path_root", dc, "--path_out", out])
        data = json.loads(open(out).read())
        assert len(data["train"]) == 2
        assert data["train"][0]["K"] == os.path.join(
            "train", seq, "calib_cam_to_cam.txt")

        cfg = Config(data_name="KITTIDC", dir_data=dc, split_json=out,
                     patch_height=32, patch_width=64, top_crop=0,
                     max_depth=90.0, num_sample=0).finalize()
        ds = get_dataset(cfg, "train")
        s = ds.__getitem__(0, np.random.default_rng(0))
        assert s["rgb"].shape == (32, 64, 3)
        assert s["K"][0] == pytest.approx(720.0 * (s["K"][0] / 720.0))

    def test_date_level_calib_fallback(self, tmp_path):
        """Trees with date-level calib (our old layout) still resolve."""
        import numpy as np
        from PIL import Image

        from nlspn_eccv20_tpu.config import Config
        from nlspn_eccv20_tpu.data import get_dataset

        dc = str(tmp_path / "dc")
        seq = "2011_09_26_drive_0001_sync"
        rng = np.random.default_rng(0)
        base = os.path.join(dc, "train", seq)
        fn = "0000000000.png"
        gt = (rng.random((60, 100)) * 80 * 256).astype(np.uint16)
        for sub in ("groundtruth", "velodyne_raw"):
            os.makedirs(os.path.join(base, "proj_depth", sub, "image_02"),
                        exist_ok=True)
            Image.fromarray(gt).save(
                os.path.join(base, "proj_depth", sub, "image_02", fn))
        os.makedirs(os.path.join(base, "image_02", "data"), exist_ok=True)
        Image.fromarray(rng.integers(0, 256, (60, 100, 3),
                                     dtype=np.uint8)).save(
            os.path.join(base, "image_02", "data", fn))
        P = ("7.2e+02 0.0 6.0e+01 4.4e+01 0.0 7.2e+02 4.7e+01 2.1e-01 "
             "0.0 0.0 1.0 2.7e-03")
        os.makedirs(os.path.join(dc, "2011_09_26"), exist_ok=True)
        with open(os.path.join(dc, "2011_09_26", "calib_cam_to_cam.txt"),
                  "w") as f:
            f.write(f"P_rect_02: {P}\nP_rect_03: {P}\n")
        # JSON points at the (missing) reference-layout path; loader must
        # fall back to the date-level file.
        sj = str(tmp_path / "split.json")
        with open(sj, "w") as f:
            json.dump({"train": [{
                "rgb": f"train/{seq}/image_02/data/{fn}",
                "depth": f"train/{seq}/proj_depth/velodyne_raw/image_02/{fn}",
                "gt": f"train/{seq}/proj_depth/groundtruth/image_02/{fn}",
                "K": f"train/{seq}/calib_cam_to_cam.txt",
            }], "val": [], "test": []}, f)
        cfg = Config(data_name="KITTIDC", dir_data=dc, split_json=sj,
                     patch_height=32, patch_width=64, top_crop=0,
                     max_depth=90.0, num_sample=0).finalize()
        s = get_dataset(cfg, "train").__getitem__(0, np.random.default_rng(0))
        assert s["K"].shape == (4,)

    def test_missing_raw_sequence_skipped(self, tmp_path, capsys):
        from nlspn_eccv20_tpu.tools import prepare_kitti_dc

        dc = str(tmp_path / "dc")
        _touch(os.path.join(dc, "train", "2011_09_26_drive_0009_sync",
                            "proj_depth", "groundtruth", "image_02", "x.png"))
        n = prepare_kitti_dc.prepare_split(dc, str(tmp_path / "raw"), "train")
        assert n == 0
        assert "missing raw sequence" in capsys.readouterr().out

REF_DATA_JSON = "/root/reference/data_json"


@pytest.mark.skipif(not os.path.isdir(REF_DATA_JSON),
                    reason="reference checkout not available")
class TestVendoredSplitJsons:
    """data_json/ artifacts shipped in this repo must be content-identical
    to the reference's (data entries only — serialization differs)."""

    def _repo_json(self, name):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "data_json", name)) as f:
            return json.load(f)

    def test_nyu_json_matches_reference(self):
        ours = self._repo_json("nyu.json")
        with open(os.path.join(REF_DATA_JSON, "nyu.json")) as f:
            theirs = json.load(f)
        assert ours == theirs
        assert {k: len(v) for k, v in ours.items()} == {
            "train": 45205, "val": 2379, "test": 654}

    def test_kitti_dc_test_json_matches_reference(self):
        ours = self._repo_json("kitti_dc_test.json")
        with open(os.path.join(REF_DATA_JSON, "kitti_dc_test.json")) as f:
            theirs = json.load(f)
        assert ours == theirs
        assert len(ours["test"]) == 1000

    def test_generator_schema_matches_reference_entries(self, tmp_path):
        # generate_json_kitti_dc --test_data over a synthetic tree emits
        # entries with exactly the reference kitti_dc_test.json schema:
        # same keys, same relative-path layout, gt aliased to sparse depth.
        from nlspn_eccv20_tpu.tools import generate_json_kitti_dc

        with open(os.path.join(REF_DATA_JSON, "kitti_dc_test.json")) as f:
            ref = json.load(f)["test"]

        root = str(tmp_path / "kitti")
        base = os.path.join(root, "depth_selection",
                            "test_depth_completion_anonymous")
        for i in range(2):
            fn = f"{i:010d}.png"
            _touch(os.path.join(base, "image", fn))
            _touch(os.path.join(base, "velodyne_raw", fn))
            _touch(os.path.join(base, "intrinsics", fn[:-4] + ".txt"))
        out = tmp_path / "kitti_dc_test.json"
        _run_main(generate_json_kitti_dc,
                  ["--path_root", root, "--path_out", str(out), "--test_data"])
        ours = json.loads(out.read_text())["test"]

        assert list(ours[0]) == list(ref[0]) == ["rgb", "depth", "gt", "K"]
        for i, entry in enumerate(ours):
            assert entry["rgb"] == ref[i]["rgb"]
            assert entry["depth"] == ref[i]["depth"]
            assert entry["gt"] == ref[i]["gt"]
            assert entry["K"] == ref[i]["K"]


class TestResolveSplitJson:
    def test_default_resolves_from_any_cwd(self, tmp_path, monkeypatch):
        from nlspn_eccv20_tpu.data import resolve_split_json

        monkeypatch.chdir(tmp_path)
        p = resolve_split_json("data_json/nyu.json")
        assert os.path.isfile(p), p
        with open(p) as f:
            assert "train" in json.load(f)

    def test_existing_and_absolute_paths_untouched(self, tmp_path):
        from nlspn_eccv20_tpu.data import resolve_split_json

        f = tmp_path / "x.json"
        f.write_text("{}")
        assert resolve_split_json(str(f)) == str(f)
        assert resolve_split_json("/no/such/file.json") == "/no/such/file.json"
