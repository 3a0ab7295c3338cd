"""Copy KITTI raw RGB / oxts / calib into the KITTI DC tree.

Equivalent of /root/reference/utils/prepare_KITTI_DC.py:53-105: for each
train/val sequence in the depth-completion download, pull image_02/image_03
frames, oxts and the three calib txts from the corresponding KITTI raw
sequence so the DC tree is self-contained.

Usage:
  python -m nlspn_eccv20_tpu.tools.prepare_kitti_dc \
      --path_dc /data/KITTIDepthCompletion --path_raw /data/KITTIRaw
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil


CALIB_FILES = ("calib_cam_to_cam.txt", "calib_imu_to_velo.txt",
               "calib_velo_to_cam.txt")


def prepare_split(path_dc: str, path_raw: str, split: str, dry_run: bool = False):
    seqs = sorted(glob.glob(os.path.join(path_dc, split, "*_sync")))
    copied = 0
    for seq in seqs:
        name = os.path.basename(seq)
        date = name[:10]
        raw_seq = os.path.join(path_raw, date, name)
        if not os.path.isdir(raw_seq):
            print(f"missing raw sequence: {raw_seq}")
            continue
        for sub in ("image_02", "image_03", "oxts"):
            src = os.path.join(raw_seq, sub)
            dst = os.path.join(seq, sub)
            if os.path.isdir(src) and not os.path.isdir(dst):
                if not dry_run:
                    shutil.copytree(src, dst)
                copied += 1
        # calib files are copied INTO each sequence dir — the reference
        # layout (prepare_KITTI_DC.py:85-90), so trees prepared by either
        # tool stay interoperable.
        for cf in CALIB_FILES:
            src = os.path.join(path_raw, date, cf)
            dst = os.path.join(seq, cf)
            if os.path.isfile(src) and not os.path.isfile(dst):
                if not dry_run:
                    shutil.copy2(src, dst)
                copied += 1
    return copied


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path_dc", required=True)
    ap.add_argument("--path_raw", required=True)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()
    n = 0
    for split in ("train", "val"):
        n += prepare_split(args.path_dc, args.path_raw, split, args.dry_run)
    print(f"copied {n} items")


if __name__ == "__main__":
    main()
