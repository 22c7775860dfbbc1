"""Device mesh and sharding placement (SURVEY.md §2.2 — ABSENT in the reference,
first-class here).

Design: a 2-D logical mesh (data, model).

  * data axis  — batch sharding (DP). The fused train step computes per-device
    micro-batches; the XLA SPMD partitioner inserts the gradient all-reduces over ICI
    automatically because parameters are replicated (or model-sharded) while the batch
    is data-sharded. No hand-written collectives.
  * model axis — optional tensor parallelism for the conv stacks: output-channel
    sharding of the large conv kernels. Activations become channel-sharded after a
    sharded conv; XLA inserts the all-gathers/reduce-scatters where the next layer
    needs them. For the 18M/6M-param SHMGAN models DP is the workhorse
    (BASELINE.json config 5); TP is exposed so model-parallel sharding is a config,
    not a rewrite.

Everything goes through NamedSharding so the same jitted step runs on 1 chip, a
v5e-8 slice, or the 8-virtual-device CPU test backend unchanged.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shmgan_tpu.config import Config

# Conv kernels with at least this many output channels get model-sharded (when the
# model axis is >1). Smaller kernels replicate — the collective cost outweighs the
# FLOP split below this width.
_MIN_SHARDED_CHANNELS = 256


def maybe_initialize_distributed() -> bool:
    """Initialize JAX's multi-host runtime when launched under a multi-host
    coordinator (SURVEY.md §2.2: only needed if a multi-host topology is attached;
    a single v5e slice or chip needs nothing). Safe no-op otherwise."""
    import os
    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def make_mesh(cfg: Config, devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.mesh.model_parallel)
    dp = cfg.mesh.data_parallel
    if dp == -1:
        dp = n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs more than the {n} devices present")
    # An explicit smaller mesh is allowed (e.g. single-device runs on a multi-device
    # host): use the first dp*mp devices.
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, (cfg.mesh.data_axis, cfg.mesh.model_axis))


def batch_sharding(mesh: Mesh, batch_axis_index: int = 1, ndim: int = 5,
                   spatial: bool = False) -> NamedSharding:
    """Sharding for a (V, B, H, W, 3) stacked-views batch: B over the data axis;
    with spatial=True, H additionally shards over the model axis (the vision
    analogue of sequence parallelism — XLA GSPMD inserts the conv halo
    exchanges; SURVEY.md §2.2 'optional extension')."""
    spec = [None] * ndim
    spec[batch_axis_index] = mesh.axis_names[0]
    if spatial and ndim >= 4:
        spec[batch_axis_index + 1] = mesh.axis_names[1]  # H axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(views, mesh: Mesh, spatial: bool = False):
    return jax.device_put(views, batch_sharding(mesh, ndim=views.ndim,
                                                spatial=spatial))


def _output_extent(path_keys: str, image_size: int):
    """Spatial extent of the feature map a conv kernel at `path_keys` writes,
    from the known SHMGAN topologies: D 'block{i}' = stride-2 conv i
    (ShmGANwithSSpecSeg.py:353-361 -> extent /2^(i+1)); G 'down{i}' ends in a
    2x2 AveragePool (:243-277), 'bottleneck' sits after 4 pools. Returns None
    when the path isn't a depth-indexed block (head/attention/up convs — all
    at extent >= image_size/16)."""
    import re
    m = re.search(r"block(\d+)/", path_keys)
    if m:
        return image_size // (2 ** (int(m.group(1)) + 1))
    m = re.search(r"down(\d+)/", path_keys)
    if m:
        return image_size // (2 ** (int(m.group(1)) + 1))
    if "bottleneck" in path_keys:
        return image_size // 16
    return None


def _param_spec(path_keys: str, leaf, mesh: Mesh, model_parallel: bool,
                image_size: int = 0,
                min_channels: int = _MIN_SHARDED_CHANNELS) -> P:
    if not model_parallel:
        return P()
    # Output-channel sharding for large conv kernels (HWIO -> shard O) and the class
    # dense (shard the flattened-input dim, which is huge: 16384).
    model_axis = mesh.axis_names[1]
    msize = mesh.shape[model_axis]
    if leaf.ndim == 4 and leaf.shape[-1] >= min_channels \
            and leaf.shape[-1] % msize == 0:
        # Spatially-degenerate feature maps (1x1 at the discriminator's deepest
        # block on small images) trip GSPMD's sharding propagation into an
        # "Involuntary full rematerialization" resharding of the backward
        # activations (MULTICHIP_r02 finding; reproduced + bisected to extent
        # on the 8-device CPU mesh). Keep such kernels replicated — at 1x1
        # extent the conv is a pointwise matmul with nothing to gain from TP.
        if image_size:
            extent = _output_extent(path_keys, image_size)
            if extent is not None and extent < 2:
                return P()
        return P(None, None, None, model_axis)
    if leaf.ndim == 2 and leaf.shape[0] % msize == 0 and leaf.shape[0] >= 1024:
        return P(model_axis, None)
    return P()


def param_shardings(params: Any, mesh: Mesh, spatial: bool = False,
                    image_size: int = 0,
                    min_channels: int = _MIN_SHARDED_CHANNELS) -> Any:
    """A NamedSharding tree matching `params`. In spatial mode the model axis is
    occupied by activation-H sharding, so parameters replicate. image_size
    (when known) gates TP off kernels whose feature maps are spatially
    degenerate (see _param_spec)."""
    model_parallel = mesh.shape[mesh.axis_names[1]] > 1 and not spatial

    def one(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, _param_spec(keys, leaf, mesh, model_parallel,
                                               image_size=image_size,
                                               min_channels=min_channels))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_train_state(state, mesh: Mesh, spatial: bool = False,
                      image_size: int = 0,
                      min_channels: int = _MIN_SHARDED_CHANNELS):
    """Place a TrainState on the mesh: params per the TP rules (opt state mirrors its
    params automatically via tree structure), everything else replicated.
    Pass image_size so the TP spec can skip spatially-degenerate kernels."""
    replicated = NamedSharding(mesh, P())

    g_sh = param_shardings(state.g_params, mesh, spatial=spatial,
                           image_size=image_size, min_channels=min_channels)
    d_sh = param_shardings(state.d_params, mesh, spatial=spatial,
                           image_size=image_size, min_channels=min_channels)

    def put(tree, sh):
        return jax.tree_util.tree_map(jax.device_put, tree, sh)

    def put_opt(opt_state, params, params_sh):
        # optax's ScaleByAdamState mu/nu subtrees mirror the param tree; shard each
        # optimizer-state leaf like the param whose (shape, dtype) it matches, and
        # replicate the rest (counts, scalars).
        shape_to_sh = {}
        for p, s in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_sh)):
            shape_to_sh.setdefault((p.shape, p.dtype), s)

        def place(leaf):
            key = (getattr(leaf, "shape", None), getattr(leaf, "dtype", None))
            return jax.device_put(leaf, shape_to_sh.get(key, replicated))

        return jax.tree_util.tree_map(place, opt_state)

    g_opt = put_opt(state.g_opt_state, state.g_params, g_sh)
    d_opt = put_opt(state.d_opt_state, state.d_params, d_sh)

    return state.replace(
        step=jax.device_put(state.step, replicated),
        g_params=put(state.g_params, g_sh),
        d_params=put(state.d_params, d_sh),
        specseg_vars=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated), state.specseg_vars),
        g_opt_state=g_opt,
        d_opt_state=d_opt,
        # the EMA tree mirrors g_params leaf-for-leaf, so it shards identically
        ema_g_params=(None if state.ema_g_params is None
                      else put(state.ema_g_params, g_sh)),
    )
