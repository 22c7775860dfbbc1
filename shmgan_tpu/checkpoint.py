"""Checkpointing: Orbax train-state persistence + SpecSeg keras-h5 converter.

Reference behavior replicated (SURVEY.md §5 "Checkpoint / resume"):
  tf.train.Checkpoint(generator, discriminator, optimizer_D, optimizer_G) with
  CheckpointManager(max_to_keep=3) (ShmGANwithSSpecSeg.py:938-943), restore-on-start
  (:949-951), periodic save every checkpoint_save_step epochs (:1125-1128) + final
  (:1133), test-time restore (test.py:162-170). SpecSeg weights live in a separate
  keras h5 (specsegv3_chkpt.h5, :930-931) — load_specseg_h5 converts that file into
  the Flax SpecSeg variable tree.

Here the WHOLE training state (G/D params, both Adam states, frozen SpecSeg vars,
step) is one PyTree saved atomically by Orbax — crash-safe resume by construction.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from shmgan_tpu.train.state import TrainState


# ---------------------------------------------------------------------------
# Orbax train-state checkpointing
# ---------------------------------------------------------------------------

class CheckpointManager:
    """max_to_keep Orbax manager over the full TrainState PyTree."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, step: Optional[int] = None) -> int:
        step = int(state.step) if step is None else int(step)
        if step in (self._mgr.all_steps() or []):
            return step  # idempotent (preempt save followed by final save)
        payload = {
            "step": state.step,
            "g_params": state.g_params,
            "d_params": state.d_params,
            "specseg_vars": state.specseg_vars,
            "g_opt_state": state.g_opt_state,
            "d_opt_state": state.d_opt_state,
        }
        if state.ema_g_params is not None:  # EMA runs only — layout unchanged
            payload["ema_g_params"] = state.ema_g_params
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        return step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def has_key(self, step: int, key: str) -> bool:
        """Whether the payload saved at `step` contains the top-level entry
        `key` (e.g. 'ema_g_params'). Reads the checkpoint's own tree metadata
        (StandardSave writes stringified key-tuples under default/_METADATA)
        instead of inferring from restore exceptions (ADVICE r2: a broad
        except could mask a genuinely corrupt checkpoint)."""
        import json
        meta_path = os.path.join(self.directory, str(int(step)), "default",
                                 "_METADATA")
        try:
            with open(meta_path) as f:
                tree_md = json.load(f).get("tree_metadata", {})
        except (OSError, ValueError):
            return False
        prefix = f"('{key}'"
        return any(k.startswith(prefix) for k in tree_md)

    def restore(self, template: TrainState, step: Optional[int] = None,
                include_ema: bool = False) -> Optional[TrainState]:
        """Restore into the structure of `template` (a freshly created state).
        Returns None when no checkpoint exists (reference prints 'restored!!'
        unconditionally even when nothing was restored — we are honest).

        include_ema=True restores the checkpoint's ema_g_params tree even when
        the template has no EMA slot (inference surfaces use this to deploy
        the averaged weights an EMA run was evaluated with)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        template_payload = {
            "step": template.step,
            "g_params": template.g_params,
            "d_params": template.d_params,
            "specseg_vars": template.specseg_vars,
            "g_opt_state": template.g_opt_state,
            "d_opt_state": template.d_opt_state,
        }
        ckpt_has_ema = self.has_key(step, "ema_g_params")
        want_ema = template.ema_g_params is not None or include_ema
        if ckpt_has_ema:
            # EMA tree mirrors g_params leaf-for-leaf; a zeros template of the
            # right structure suffices even when the template lacks the slot
            template_payload["ema_g_params"] = (
                template.ema_g_params if template.ema_g_params is not None
                else jax.tree_util.tree_map(jnp.zeros_like, template.g_params))
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template_payload))
        if ckpt_has_ema and not want_ema:
            # non-EMA caller over an EMA checkpoint: leave the state EMA-free
            # (the slot's presence is what arms in-step EMA maintenance)
            restored.pop("ema_g_params")
        if template.ema_g_params is not None and not ckpt_has_ema:
            # EMA run resuming a pre-EMA checkpoint: seed the EMA from the
            # restored generator params (copy — no aliasing, donation-safe)
            restored["ema_g_params"] = jax.tree_util.tree_map(
                jnp.copy, restored["g_params"])
        return template.replace(**restored)

    def close(self):
        self._mgr.close()


# ---------------------------------------------------------------------------
# Keras-h5 -> Flax SpecSeg converter
# ---------------------------------------------------------------------------

# Keras layer-name order as produced by the reference SpecSeg builder
# (SpecSeg.py:34-88): 10 contracting convs interleaved with 5 BN layers, then
# 4 x (transpose + 2 convs), then the 1x1 head. Default keras names are
# conv2d, conv2d_1, ... / batch_normalization, ... / conv2d_transpose, ...
_FLAX_CONV_ORDER = [
    "down0/conv0", "down0/conv1", "down1/conv0", "down1/conv1",
    "down2/conv0", "down2/conv1", "down3/conv0", "down3/conv1",
    "bottom/conv0", "bottom/conv1",
    "up0/conv0", "up0/conv1", "up1/conv0", "up1/conv1",
    "up2/conv0", "up2/conv1", "up3/conv0", "up3/conv1",
    "head",
]
_FLAX_BN_ORDER = ["down0/bn", "down1/bn", "down2/bn", "down3/bn", "bottom/bn"]
_FLAX_CONVT_ORDER = ["up0_t", "up1_t", "up2_t", "up3_t"]


def _keras_name(base: str, idx: int) -> str:
    return base if idx == 0 else f"{base}_{idx}"


def _collect_h5_weights(h5file) -> dict:
    """{layer_name: {weight_short_name: np.ndarray}} from a keras .h5 weight file.

    Handles both `model_weights/<layer>/...` (full save) and `<layer>/...`
    (save_weights) layouts, with arbitrary nesting below the layer group.
    """
    import h5py

    if "model_weights" in h5file:        # keras-2 full-model save (the reference's)
        root = h5file["model_weights"]
    elif "layers" in h5file:             # keras-3 save_weights layout
        root = h5file["layers"]
    else:                                # keras-2 save_weights layout
        root = h5file
    out = {}

    # keras-3 legacy-h5 stores positional names ("vars/0", "vars/1", ...); keras-2
    # (the reference's TF 2.8 era, which produced specsegv3_chkpt.h5) stores
    # "kernel:0"-style names. Normalize both to short semantic names.
    _POSITIONAL = {
        "conv": ["kernel", "bias"],
        "bn": ["gamma", "beta", "moving_mean", "moving_variance"],
    }

    def visit(layer_name, group):
        weights = {}

        def leaf(name, obj):
            if isinstance(obj, h5py.Dataset):
                short = name.split("/")[-1].split(":")[0]
                weights[short] = np.asarray(obj)

        group.visititems(leaf)
        if weights and all(k.isdigit() for k in weights):
            kind = "bn" if "batch_normalization" in layer_name else "conv"
            names = _POSITIONAL[kind]
            weights = {names[int(k)]: v for k, v in weights.items()}
        if weights:
            out[layer_name] = weights

    for layer_name in root:
        visit(layer_name, root[layer_name])
    return out


def convert_keras_convt_kernel(k_tf: np.ndarray) -> np.ndarray:
    """Keras Conv2DTranspose kernel (kh, kw, out, in) -> flax ConvTranspose
    (kh, kw, in, out) computing the identical function.

    TF's conv2d_transpose is the gradient of a SAME convolution: correlation with
    the spatially-flipped kernel. flax.nn.ConvTranspose (transpose_kernel=False)
    correlates the dilated input with its kernel directly, so the keras kernel must
    be spatially flipped and in/out-transposed. Verified against keras in
    tests/test_tf_parity.py.
    """
    return np.ascontiguousarray(k_tf[::-1, ::-1].transpose(0, 1, 3, 2))


def load_specseg_h5(path: str) -> Any:
    """Convert a reference-format SpecSeg keras h5 checkpoint (specsegv3_chkpt.h5,
    ShmGANwithSSpecSeg.py:931) into the Flax SpecSeg variable tree
    {'params': ..., 'batch_stats': ...}."""
    import h5py

    with h5py.File(path, "r") as f:
        layers = _collect_h5_weights(f)

    params: dict = {}
    batch_stats: dict = {}

    def set_path(tree, path, leaf):
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    for i, flax_path in enumerate(_FLAX_CONV_ORDER):
        w = layers[_keras_name("conv2d", i)]
        set_path(params, flax_path + "/kernel", w["kernel"].astype(np.float32))
        set_path(params, flax_path + "/bias", w["bias"].astype(np.float32))

    for i, flax_path in enumerate(_FLAX_BN_ORDER):
        w = layers[_keras_name("batch_normalization", i)]
        set_path(params, flax_path + "/scale", w["gamma"].astype(np.float32))
        set_path(params, flax_path + "/bias", w["beta"].astype(np.float32))
        set_path(batch_stats, flax_path + "/mean", w["moving_mean"].astype(np.float32))
        set_path(batch_stats, flax_path + "/var",
                 w["moving_variance"].astype(np.float32))

    for i, flax_path in enumerate(_FLAX_CONVT_ORDER):
        w = layers[_keras_name("conv2d_transpose", i)]
        set_path(params, flax_path + "/kernel",
                 convert_keras_convt_kernel(w["kernel"]))
        set_path(params, flax_path + "/bias", w["bias"].astype(np.float32))

    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# Native SpecSeg weight artifacts (msgpack)
# ---------------------------------------------------------------------------
# The reference hands SpecSeg weights around as a keras h5 blob
# (ShmGANwithSSpecSeg.py:930-931). This framework can TRAIN SpecSeg itself
# (train/specseg_train.py), so it also needs a native round-trip format for the
# frozen variable tree: flax msgpack, loadable via cfg.eval.specseg_weights.

def save_specseg_msgpack(specseg_vars: Any, path: str) -> None:
    """Serialize a SpecSeg variable tree {'params':..., 'batch_stats':...}."""
    import flax.serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(specseg_vars)))


def specseg_in_channels_of(specseg_vars: Any) -> int:
    """Input-channel count of an ALREADY-LOADED SpecSeg variable tree (or raw
    msgpack-restored state dict — same key layout), read off the first conv
    kernel's shape (HWIO -> index 2). Lets every surface distinguish 1-channel
    (parity) and 2-channel (chroma-input, ops/specprior.py) nets without
    re-reading the weight file. Shape-only, so it is safe on jit tracers
    (eval/fid.py calls it inside compiled oracles)."""
    return int(specseg_vars["params"]["down0"]["conv0"]["kernel"].shape[2])


def specseg_msgpack_in_channels(path: str) -> int:
    """Input-channel count a saved SpecSeg msgpack was trained with. Parses
    the whole file; when the tree is already loaded prefer
    specseg_in_channels_of (load_specseg_msgpack parses only once)."""
    import flax.serialization

    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    return specseg_in_channels_of(raw)


def load_specseg_msgpack(path: str, base_filters: int = 16,
                         image_size: int = 128,
                         in_channels: Optional[int] = None) -> Any:
    """Load a SpecSeg variable tree saved by save_specseg_msgpack. The template
    tree comes from a fresh init (shapes only; eval_shape keeps it cheap);
    in_channels=None reads the count from the file itself. The multi-MB file
    is parsed exactly once — auto-detection reads the raw restored tree."""
    import flax.serialization
    import jax.numpy as jnp

    from shmgan_tpu.models import SpecSeg

    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if in_channels is None:
        in_channels = specseg_in_channels_of(raw)
    net = SpecSeg(base_filters=base_filters)
    template = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, image_size, image_size, in_channels),
                                   jnp.float32),
                         train=False))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    return flax.serialization.from_state_dict(template, raw)


def load_specseg_weights(path: str, base_filters: int = 16,
                         image_size: int = 128) -> Any:
    """Dispatch on extension: .h5 (reference keras format, always 1-channel)
    or .msgpack (native; input-channel count auto-detected). Callers needing
    the detected count should call specseg_in_channels_of on the result
    instead of re-parsing the file."""
    if path.endswith(".msgpack"):
        return load_specseg_msgpack(path, base_filters=base_filters,
                                    image_size=image_size)
    return load_specseg_h5(path)


# ---------------------------------------------------------------------------
# Deployable inference bundle (generator + SpecSeg, no optimizer state)
# ---------------------------------------------------------------------------
# A full train checkpoint carries both Adam states (~3x the parameter bytes) and
# the discriminator — none of it needed to serve. The bundle is a single flax
# msgpack of {g_params, specseg_vars} + a tiny json header with the model
# hyperparameters needed to rebuild the graph.

def export_inference_bundle(state, cfg, path: str,
                            store_dtype: Optional[str] = None) -> None:
    """Write a serving bundle from a TrainState: <path> (msgpack) and
    <path>.json (model config header).

    store_dtype="float16" halves the artifact (the weights are [-?, ?]-scale
    conv kernels; fp16's 2^-24 resolution is far below their train-time
    noise floor) — used to keep a deployable flagship INSIDE the repo, which
    is the only storage that survives environment resets on this deployment.
    load_inference_bundle casts floats back to float32."""
    import json

    import flax.serialization

    payload = {"g_params": jax.device_get(state.g_params),
               "specseg_vars": jax.device_get(state.specseg_vars)}
    if store_dtype is not None:
        dt = np.dtype(store_dtype)
        payload = jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    header = {"step": int(state.step),
              "image_size": cfg.model.image_size,
              "filter_size": cfg.model.filter_size,
              "c_dim": cfg.model.c_dim,
              "specseg_base_filters": cfg.model.specseg_base_filters,
              "specseg_in_channels": cfg.model.specseg_in_channels,
              # both upsample modes share one param-tree structure, so the
              # bytes load either way — the header is what keeps the serving
              # graph on the op the weights were trained for
              "upsample_mode": cfg.model.upsample_mode}
    if store_dtype is not None:
        header["store_dtype"] = str(store_dtype)
    with open(path + ".json", "w") as f:
        json.dump(header, f, indent=1)


def load_inference_bundle(path: str):
    """-> (g_params, specseg_vars, header_dict). Template trees come from a
    fresh eval_shape init using the bundle's own header."""
    import json

    import flax.serialization
    import jax.numpy as jnp

    from shmgan_tpu.models import SpecSeg
    from shmgan_tpu.train.state import build_models
    from shmgan_tpu.config import Config

    with open(path + ".json") as f:
        header = json.load(f)

    import dataclasses
    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=header["image_size"],
        filter_size=header["filter_size"], c_dim=header["c_dim"],
        specseg_base_filters=header["specseg_base_filters"],
        specseg_in_channels=header.get("specseg_in_channels", 1),
        upsample_mode=header.get("upsample_mode", "conv_transpose"))
    gen, _disc, specseg = build_models(cfg)
    h = w = cfg.model.image_size
    c = cfg.model.c_dim

    def init():
        kg, ks = jax.random.split(jax.random.PRNGKey(0))
        g = gen.init(kg, jnp.zeros((1, h, w, 2 * c), jnp.float32),
                     jnp.zeros((1, h, w, 1), jnp.float32))["params"]
        s = specseg.init(
            ks, jnp.zeros((1, h, w, cfg.model.specseg_in_channels),
                          jnp.float32), train=False)
        return {"g_params": g, "specseg_vars": s}

    template = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                      jax.eval_shape(init))
    with open(path, "rb") as f:
        loaded = flax.serialization.from_bytes(template, f.read())
    if header.get("store_dtype"):
        # compact bundles store floats in a narrower dtype; compute stays f32
        loaded = jax.tree_util.tree_map(
            lambda x: x.astype(np.float32)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            loaded)
    return loaded["g_params"], loaded["specseg_vars"], header


def transfer_matching_params(dst_tree, src_tree):
    """Copy every leaf of src_tree into dst_tree where the tree path exists in
    both with identical shape and dtype; keep dst's leaf elsewhere.

    Used for resolution warm starts: the fully-convolutional params (all of G
    and SpecSeg, all of D except its Flatten->Dense class head) are size-
    agnostic and transfer leaf-for-leaf across image sizes. Returns
    (merged_tree, kept_count, fresh_count).
    """
    import jax

    counts = {"kept": 0, "fresh": 0}

    def pick(new, old):
        if getattr(new, "shape", None) == getattr(old, "shape", None) \
                and getattr(new, "dtype", None) == getattr(old, "dtype", None):
            counts["kept"] += 1
            return old
        counts["fresh"] += 1
        return new

    merged = jax.tree_util.tree_map(pick, dst_tree, src_tree)
    return merged, counts["kept"], counts["fresh"]
