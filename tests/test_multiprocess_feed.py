"""Two-process multi-host feed test: put_global_batch's
jax.make_array_from_process_local_data branch executed for real.

Spawns two fresh CPU processes (4 virtual devices each -> 8 global) joined
through jax.distributed with a localhost coordinator. Each process loads only
its slice of the global batch via PolarimetricDataset.iter_epoch(process_index,
process_count), places it with put_global_batch, and the pair verify the
assembled global array: correct shape, addressable-shard data matching the
expected slice rows, and a cross-host psum over the batch equal to the
single-process ground truth.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_CHILD = r"""
import os, sys, json
import numpy as np

import jax
jax.distributed.initialize(coordinator_address=os.environ["COORD"],
                           num_processes=2,
                           process_id=int(os.environ["PROC_ID"]))
import jax.numpy as jnp
from shmgan_tpu.config import Config, DataConfig
from shmgan_tpu.data.loader import PolarimetricDataset
from shmgan_tpu.data.pipeline import put_global_batch
from shmgan_tpu.parallel.mesh import make_mesh

pid = int(os.environ["PROC_ID"])
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

root = os.environ["TREE"]
cfg = DataConfig(data_dir=root, cache_in_memory=True)
ds = PolarimetricDataset(cfg, image_size=16, batch_size=8)
mesh = make_mesh(Config())            # dp=8 over the global devices

# every process walks the same order; each loads only its slice
local = next(ds.iter_epoch(shuffle_seed=5, process_index=pid, process_count=2))
assert local.shape[1] == 4, local.shape
arr = put_global_batch(local, mesh)
assert arr.shape == (5, 8, 16, 16, 3), arr.shape

# ground truth: the full global batch, reconstructed identically by each process
full = next(ds.iter_epoch(shuffle_seed=5))

# addressable shards carry this process's rows of the global batch
for shard in arr.addressable_shards:
    b_index = shard.index[1]          # slice along the batch axis
    np.testing.assert_array_equal(np.asarray(shard.data),
                                  full[:, b_index, ...])

# cross-host collective over the assembled array equals the local ground truth
from jax.sharding import NamedSharding, PartitionSpec as P
total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(arr)
np.testing.assert_allclose(float(total), float(full.sum()), rtol=1e-6)
print(f"CHILD_{pid}_OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_feed_assembles_global_batch(tmp_path):
    from shmgan_tpu.data.synthetic import write_fixture_tree

    tree = str(tmp_path / "tree")
    write_fixture_tree(tree, 8, 16, seed=4)

    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                             "AXON_POOL_SVC_OVERRIDE", "AXON_LOOPBACK_RELAY")}
    env_base.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "COORD": f"127.0.0.1:{port}",
        "TREE": tree,
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + [p for p in sys.path if p]),
    })

    procs = []
    for pid in (0, 1):
        env = dict(env_base, PROC_ID=str(pid))
        procs.append(subprocess.Popen([sys.executable, "-c", _CHILD], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"child {pid} rc={rc}\n{err[-2000:]}"
        assert f"CHILD_{pid}_OK" in out
