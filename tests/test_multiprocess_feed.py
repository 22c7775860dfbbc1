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


_TRAIN_CHILD = r"""
import os
import numpy as np

import jax
jax.distributed.initialize(coordinator_address=os.environ["COORD"],
                           num_processes=2,
                           process_id=int(os.environ["PROC_ID"]))
import dataclasses
import jax.numpy as jnp
from shmgan_tpu.config import Config
from shmgan_tpu.data.pipeline import put_global_batch
from shmgan_tpu.parallel.mesh import make_mesh, shard_train_state
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_train_step

pid = int(os.environ["PROC_ID"])
assert jax.device_count() == 8

cfg = Config()
cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                specseg_base_filters=4)
cfg.train = dataclasses.replace(cfg.train, batch_size=8)
cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=8, model_parallel=1)

mesh = make_mesh(cfg)
# identical seed -> identical replicated params on both processes
state = create_train_state(cfg, jax.random.PRNGKey(0))
state = shard_train_state(state, mesh)

# process-local half of the global batch, assembled into the global array
rng = np.random.default_rng(7)
full = rng.uniform(0, 1, (5, 8, 32, 32, 3)).astype(np.float32)
local = full[:, pid * 4:(pid + 1) * 4]
views = put_global_batch(local, mesh)

step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
new_state, metrics = step(state, views, jax.random.PRNGKey(2),
                          jnp.zeros((), jnp.int32))
tg = float(jax.device_get(metrics["total_G"]))
td = float(jax.device_get(metrics["total_D"]))
assert np.isfinite(tg) and np.isfinite(td), (tg, td)
assert int(jax.device_get(new_state.step)) == 1
print(f"TRAIN_{pid}_OK total_G={tg:.6f} total_D={td:.6f}")
"""


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    """One fused GAN train step executed across TWO jax.distributed processes
    (8 global devices, DP mesh, process-local feeding). Both processes must
    agree on the loss — the gradient all-reduce crossed process boundaries."""
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                             "AXON_POOL_SVC_OVERRIDE", "AXON_LOOPBACK_RELAY")}
    env_base.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "COORD": f"127.0.0.1:{port}",
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + [p for p in sys.path if p]),
    })
    procs = []
    for pid in (0, 1):
        env = dict(env_base, PROC_ID=str(pid))
        procs.append(subprocess.Popen([sys.executable, "-c", _TRAIN_CHILD],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    lines = []
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"child {pid} rc={rc}\n{err[-2000:]}"
        line = [ln for ln in out.splitlines() if f"TRAIN_{pid}_OK" in ln]
        assert line, out
        lines.append(line[0].split("OK", 1)[1])
    # both processes computed the same global loss
    assert lines[0] == lines[1], lines
