"""Multi-host (DCN) wiring: 2 real CPU processes with
jax.distributed.initialize, disjoint per-rank loader batches, and a pjit
computation over the cross-process global mesh.

The reference exposes (num_replicas, rank) in its batch sampler but pins it
to (1, 0) (meldataset.py:218-220, 239-246); here the train loop feeds
jax.process_count()/process_index() and assembles global arrays with
make_array_from_process_local_data (parallel.shard_batch).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
sys.path.insert(0, sys.argv[3])
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from styletts2_tpu.data.sampler import DurationBinSampler
from styletts2_tpu.parallel import make_mesh, shard_batch

rank = jax.process_index()
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 virtual devices x 2 processes

# --- per-rank disjoint duration-binned batches ---------------------------
lengths = [300 * f for f in (25, 26, 27, 28, 45, 46, 47, 48)]
s = DurationBinSampler(lengths, batch_size=2, num_replicas=2, rank=rank,
                       shuffle=False, drop_last=True)
mine = sorted(i for _, b in s for i in b)

# --- global-mesh computation: each process contributes its local shard ---
mesh = make_mesh(-1)  # all 4 devices across both processes
local = np.full((2, 4), float(rank + 1), np.float32)  # 2 local rows
arr = shard_batch(mesh, local)
assert arr.shape == (4, 4)  # global batch = 2 rows per process

total = jax.jit(lambda x: x.sum(),
                in_shardings=jax.sharding.NamedSharding(mesh, P("dp")),
                out_shardings=jax.sharding.NamedSharding(mesh, P()))(arr)
print(json.dumps({"rank": rank, "mine": mine, "total": float(total)}))
"""


@pytest.mark.skipif(os.environ.get("STYLETTS2_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_data_sharding(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i), repo],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out.strip().splitlines()[-1])

    import json

    res = {json.loads(o)["rank"]: json.loads(o) for o in outs}
    mine0, mine1 = set(res[0]["mine"]), set(res[1]["mine"])
    # disjoint per-rank shards covering every sample
    assert mine0.isdisjoint(mine1)
    assert mine0 | mine1 == set(range(8))
    # the global sum saw both processes' contributions: 2 rows of 1s and
    # 2 rows of 2s, 4 columns each -> 8 + 16
    assert res[0]["total"] == res[1]["total"] == 24.0
