"""Multi-process distributed smoke test on localhost CPU.

The TPU-world analog of mxnet's tests/nightly/dist_sync_kvstore.py run via
`launch.py --launcher local` (SURVEY.md §4): real separate processes,
jax.distributed rendezvous, a psum across process boundaries.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
from resnet_tpu.parallel.dist import maybe_init_distributed, proc_info
assert maybe_init_distributed(), "env not picked up"
nproc, rank = proc_info()
assert nproc == 2
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np
mesh = Mesh(np.asarray(jax.devices()), ("data",))
# each process contributes rank+1; global psum must equal 3 on both
local = jnp.float32(rank + 1)
arrs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.full((1,), rank + 1, np.float32))
total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(arrs)
assert float(total) == 3.0, float(total)
print(f"rank {rank} ok total={float(total)}")
"""


def test_two_process_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env["REPO_ROOT"] = repo
        env["RESNET_TPU_COORDINATOR"] = "127.0.0.1:23456"
        env["RESNET_TPU_NUM_PROCS"] = "2"
        env["RESNET_TPU_PROC_ID"] = str(rank)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("rank 0 ok" in o for o in outs)
    assert any("rank 1 ok" in o for o in outs)
