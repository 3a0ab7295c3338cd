"""Orbax checkpointing with the reference's keep-last-1 policy.

Reference behavior (/root/reference/src/main.py:263-280, SURVEY.md aux):
per-epoch save of {net, optimizer, scheduler, amp, args} with the previous
epoch's file deleted; resume restores everything and replaces the config
from the checkpoint (main.py:57-77). Here: Orbax CheckpointManager with
max_to_keep=1 (or all when save_full=False semantics differ — we always
keep 1 like the reference), saving {params, batch_stats, opt_state, step,
epoch} plus the config JSON alongside.
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
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.dir, "ckpt"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                 create=True),
        )

    def save(self, epoch: int, state: Dict[str, Any]):
        """state: pytree dict (params, batch_stats, opt_state, step...)."""
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
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    @staticmethod
    def load_config(save_dir: str) -> Config:
        with open(os.path.join(save_dir, "args.json")) as f:
            return Config.from_json(f.read()).finalize()

    def close(self):
        self._mgr.close()
