"""Multi-host wiring: 2-process jax.distributed on localhost CPU.

The reference is strictly single-process; the TPU-native framework scales
across hosts with ``jax.distributed`` (SURVEY.md §2.4).  This test launches
two real processes that form one 4-device global CPU mesh, run a psum over
the real mesh, and split classification work via the file-locked
SampleQueue — verifying the wiring the CLI flags
(``--coordinator/--num-processes/--process-id``) feed.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(root)r)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
from kmer_id_tpu.parallel.distributed import initialize, SampleQueue
initialize(coordinator=%(coord)r, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

# a psum over the full cross-process mesh
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
def f(x):
    return jax.lax.psum(x, "data")
g = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P()))
x = jax.device_put(np.arange(8, dtype=np.int32), NamedSharding(mesh, P("data")))
got = np.asarray(g(x))
want = np.arange(8, dtype=np.int32).reshape(4, 2).sum(axis=0)
assert (got == want).all(), (got, want)

# cross-process work split via the file-locked sample queue
q = SampleQueue(os.path.join(%(qdir)r, "manifest.json"), [f"s{i}" for i in range(8)])
mine = []
while True:
    s = q.claim(f"proc{pid}")
    if s is None:
        break
    mine.append(s)
    q.complete(s)
print(json.dumps({"pid": pid, "claimed": mine}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_mesh_and_queue(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    qdir = str(tmp_path)
    script = _WORKER % {"root": ROOT, "coord": coord, "qdir": qdir}
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    claimed = sorted(outs[0]["claimed"] + outs[1]["claimed"])
    assert claimed == [f"s{i}" for i in range(8)], claimed  # each sample once
