"""Orbax checkpointing with the reference's keep-last-1 policy.

Reference behavior (/root/reference/src/main.py:263-280, SURVEY.md aux):
per-epoch save of {net, optimizer, scheduler, amp, args} with the previous
epoch's file deleted; resume restores everything and replaces the config
from the checkpoint (main.py:57-77). Here: Orbax CheckpointManager with
max_to_keep=1, saving {params, batch_stats, opt_state, step, ...} plus the
config JSON alongside.

``--no_save_full`` (reference config.py:202-206): non-final epochs save
weights only ({net, args} in the reference, main.py:263-275 — here
params+batch_stats); the caller passes ``full=`` per epoch, matching the
reference's ``args.save_full or epoch == args.epochs``. Restoring a
weights-only checkpoint with a full template silently drops the absent
keys (resume then continues with a fresh optimizer, reference
main.py:140-149).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from nlspn_eccv20_tpu.config import Config


class CheckpointManager:
    def __init__(self, cfg: Config, save_dir: Optional[str] = None):
        self.cfg = cfg
        self.dir = os.path.abspath(save_dir or cfg.save_dir)
        os.makedirs(self.dir, exist_ok=True)
        # item_handlers: without it a FRESH manager (new process, e.g.
        # resume) has no handler registered for the "default" item and
        # item_metadata() returns None — the saved-key inspection in
        # restore() needs it.
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.dir, "ckpt"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                 create=True),
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    # steps_per_epoch rides along even in weights-only saves (it is a tiny
    # scalar) so the resume-time LR-shift guard in main.py fires for
    # --no_save_full checkpoints too; without it, step would be silently
    # reconstructed as latest * NEW steps_per_epoch (ADVICE r4).
    WEIGHT_KEYS = ("params", "batch_stats", "steps_per_epoch")

    def save(self, epoch: int, state: Dict[str, Any], full: bool = True):
        """state: pytree dict (params, batch_stats, opt_state, step...).

        full=False keeps only the weight keys (reference {net, args} save)."""
        if not full:
            state = {k: state[k] for k in self.WEIGHT_KEYS if k in state}
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        with open(os.path.join(self.dir, "args.json"), "w") as f:
            f.write(self.cfg.to_json())

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, epoch: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        if template is not None:
            md = self._mgr.item_metadata(step)
            if md is not None and hasattr(md, "keys"):
                saved = set(md.keys())
                template = {k: v for k, v in template.items() if k in saved}
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    @staticmethod
    def load_config(save_dir: str) -> Config:
        with open(os.path.join(save_dir, "args.json")) as f:
            return Config.from_json(f.read()).finalize()

    def close(self):
        self._mgr.close()
