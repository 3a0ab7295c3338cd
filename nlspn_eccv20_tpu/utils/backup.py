"""Source-tree backup into the experiment directory.

Parity with the reference's ``backup_source_code`` (src/utility.py:87-96,
called at src/main.py:160): at train start, rank 0 snapshots the framework
source into ``<save_dir>/code`` so every experiment records the exact code
that produced it.
"""

from __future__ import annotations

import os
import shutil

_IGNORE = shutil.ignore_patterns(
    "__pycache__", "*.pyc", ".git", "*.so", "experiments", ".pytest_cache")


def backup_source_code(backup_dir: str) -> None:
    """Copy the nlspn_eccv20_tpu package source into ``backup_dir``."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.exists(backup_dir):
        shutil.rmtree(backup_dir)
    shutil.copytree(pkg_root, os.path.join(backup_dir,
                                           os.path.basename(pkg_root)),
                    ignore=_IGNORE)
