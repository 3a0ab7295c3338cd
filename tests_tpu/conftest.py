"""On-device (TPU) integration tests.

Unlike tests/ (hermetic, CPU-pinned — see tests/conftest.py), this suite
runs on the REAL attached TPU and exists to pin device-specific behavior
that cannot be observed on the CPU backend:

  * the decode_aff tail gradient vs a float64 analytic oracle, incl. the
    ReLU-boundary subgradient story (test_dec_aff_tail_grad.py)
  * end-to-end training convergence on-chip (test_convergence.py)

Run with:
    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tests_tpu/ -x -q

Each test skips itself when no TPU backend is available, so accidentally
running this suite on a CPU box is harmless (skips, not failures).
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        return
    skip = pytest.mark.skip(reason="requires a TPU backend")
    for item in items:
        item.add_marker(skip)
