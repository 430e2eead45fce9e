"""Distributed-without-a-cluster: two OS processes, one global mesh.

Each child process gets 4 virtual CPU devices, rendezvous over localhost
via jax.distributed, runs the shard_map'd synthesizer across the global
8-device (blocks, chan) mesh, and checks ITS OWN output blocks bit-exactly
against the single-process NumPy reference. This exercises the same
global-array + collective machinery a TPU pod uses over DCN/ICI.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys
import numpy as np
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from gpssim_tpu.parallel import multihost

pid = int(sys.argv[1])
multihost.initialize(
    coordinator_address={coord!r}, num_processes=2, process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8

from gpssim_tpu.config import SimConfig
from gpssim_tpu.scenario import Simulation
from gpssim_tpu.ops.synth_jax import LANES
from gpssim_tpu.ops.synth_numpy import synth_block_numpy
from gpssim_tpu.parallel.blocks import collate_plans
from gpssim_tpu.parallel.shard import pad_batch, pad_channels

cfg = SimConfig(
    nav_file=os.path.join({repo!r}, "fixtures", "brdc_test.22n"),
    duration_sec=0.9, almanac_enable=False,
)
plans = list(Simulation(cfg).iter_plans())
for p in plans:
    p.num_samples = 256  # tiny prefix of each block (CPU-speed)
n_rows = -(-256 // LANES)

mesh = multihost.global_mesh(chan_shards=2)  # (4 blocks x 2 chan) global
batch = collate_plans(plans)
padded = pad_channels(batch.args, 2)
padded, pad = pad_batch(padded, mesh.shape["blocks"])

local, sl = multihost.synthesize_multihost(padded, mesh, n_rows, 256)

ref = np.stack([synth_block_numpy(p) for p in plans])
n_real = ref.shape[0]
for i in range(sl.start, sl.stop):
    if i < n_real:
        assert np.array_equal(local[i - sl.start], ref[i]), f"block {{i}}"
print(f"process {{pid}} OK: blocks [{{sl.start}}, {{sl.stop}})")
"""


@pytest.mark.skipif(
    os.environ.get("GPSSIM_TEST_TPU", "") not in ("", "0"),
    reason="CPU multiprocess test",
)
def test_two_process_mesh_bit_identical(fixtures_dir, tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = _CHILD.format(repo=REPO, coord=coord)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"stdout:\n{out}\nstderr:\n{err[-3000:]}"
    assert "process 0 OK" in outs[0][0]
    assert "process 1 OK" in outs[1][0]
