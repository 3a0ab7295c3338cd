"""Build the NYU Depth V2 split JSON from the HDF5 tree.

Equivalent of /root/reference/utils/generate_json_NYUDepthV2.py: the
reference consumes CSPN's CSV lists and shuffles a train/val split with 5%
validation (:34-35,85-93), test from val/official (:125-136). Since the CSV
lists are an upstream artifact, this tool can also walk the HDF5 directory
tree directly (train/<scene>/*.h5, val/official/*.h5).

Usage:
  python -m nlspn_eccv20_tpu.tools.generate_json_nyu \
      --path_root /data/NYUDepthV2_HDF5 --path_out nyu.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--path_out", required=True)
    ap.add_argument("--val_ratio", type=float, default=0.05)
    ap.add_argument("--num_train", type=int, default=int(1e10))
    ap.add_argument("--num_val", type=int, default=int(1e10))
    ap.add_argument("--num_test", type=int, default=int(1e10))
    ap.add_argument("--seed", type=int, default=7240)
    args = ap.parse_args()

    random.seed(args.seed)

    train_all = sorted(glob.glob(os.path.join(args.path_root, "train", "*", "*.h5")))
    test_all = sorted(glob.glob(os.path.join(args.path_root, "val", "official", "*.h5")))
    assert train_all, f"no h5 files under {args.path_root}/train"

    rel = lambda p: os.path.relpath(p, args.path_root)
    train_all = [{"filename": rel(p)} for p in train_all]
    random.shuffle(train_all)
    n_val = int(len(train_all) * args.val_ratio)
    val = train_all[:n_val][:args.num_val]
    train = train_all[n_val:][:args.num_train]
    test = [{"filename": rel(p)} for p in test_all][:args.num_test]

    with open(args.path_out, "w") as f:
        json.dump({"train": train, "val": val, "test": test}, f, indent=2)
    print({"train": len(train), "val": len(val), "test": len(test)})


if __name__ == "__main__":
    main()
