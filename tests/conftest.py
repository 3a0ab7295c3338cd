"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the survey's test strategy (SURVEY.md section 4): multi-device
pjit/mesh code is exercised without TPU hardware via
``--xla_force_host_platform_device_count``.

NOTE: the session environment may pre-register a TPU platform plugin from
sitecustomize and programmatically pin ``jax_platforms``; the env var alone
is not enough, so we force the platform through jax.config after import.
Unit tests must be hermetic and fast; TPU integration checks live in
bench.py / __graft_entry__.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """@pytest.mark.slow tests are skipped unless RUN_SLOW=1 — they cover
    long dual-training convergence runs (minutes), not the default suite."""
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow test; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
