"""Two-process multi-controller test on the CPU backend.

Exercises the multi-host path the reference covered with mp.spawn + NCCL
(main.py:80-96): ``maybe_initialize_distributed`` rendezvous from env vars,
``shard_batch``'s ``make_array_from_process_local_data`` branch (each host
contributes only its local slice of the global batch), cross-process
reduction under jit, and rank-0 I/O gating. Runs two real subprocesses that
rendezvous over a local gRPC coordinator — no TPU pod required.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from nlspn_eccv20_tpu.parallel.mesh import (
        is_main_process, make_mesh, maybe_initialize_distributed,
        shard_batch)

    maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4

    import numpy as np

    mesh = make_mesh()  # 1-D data mesh over all 4 devices
    # Each host passes its LOCAL half of a global batch of 4: host 0 holds
    # samples valued 0,1 and host 1 holds 10,11.
    local = (np.arange(2, dtype=np.float32) + 10.0 * pid)[:, None, None, None]
    local = np.broadcast_to(local, (2, 4, 4, 1)).copy()
    batch = shard_batch(mesh, {"dep": local, "K": np.ones((2, 4), np.float32)})
    assert not batch["dep"].is_fully_addressable

    import jax.numpy as jnp

    total = jax.jit(lambda b: jnp.sum(b["dep"][..., 0, 0, 0]))(batch)
    # global sum of sample values = 0 + 1 + 10 + 11
    val = float(jax.device_get(total))
    assert abs(val - 22.0) < 1e-6, val

    # rank-0 gating
    assert is_main_process() == (pid == 0)
    print(f"WORKER{pid}_OK", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"WORKER{pid}_OK" in out, out


def test_single_process_is_noop(monkeypatch):
    """Without cluster env signals the helper must not initialize (or
    crash) — single-host runs stay single-host."""
    import jax

    from nlspn_eccv20_tpu.parallel.mesh import maybe_initialize_distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "SLURM_JOB_NUM_NODES",
              "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    maybe_initialize_distributed()
    assert jax.process_count() == 1
