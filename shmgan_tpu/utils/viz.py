"""Visualization + artifact utilities (capability parity with utils.py viz block and
the model-summary dumps).

  image_grid          — 1x5 polarimetric view grid (utils.py:201-236)
  debug_plot          — channels+masks grid of a packed generator input
                        (utils.py:241-259)
  plot_single_image   — single / per-channel plot (utils.py:263-279)
  save_dataset_hdf5   — gzip-9 hdf5 dataset dump (utils.py:143-149)
  model_summary       — parameter table per module path + totals (the reference
                        writes keras summaries to *_summary.txt every run,
                        ShmGANwithSSpecSeg.py:916-919; these are the golden
                        artifacts our param-count tests anchor to)

matplotlib is imported lazily and 'Agg' is forced — these are file-writing
utilities, not interactive ones.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt
    return plt


def _to_numpy(x) -> np.ndarray:
    arr = np.asarray(x, dtype=np.float32)
    return np.squeeze(arr)


def rescale_for_display(img: np.ndarray) -> np.ndarray:
    lo, hi = float(img.min()), float(img.max())
    return (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)


def image_grid(images: Sequence[Any], titles: Optional[Sequence[str]] = None,
               path: Optional[str] = None):
    """Row of images (default titles: the five polarimetric views)."""
    plt = _plt()
    titles = titles or ["0", "45", "90", "135", "ED"][: len(images)]
    fig = plt.figure(figsize=(3 * len(images), 3))
    for i, img in enumerate(images):
        ax = fig.add_subplot(1, len(images), i + 1, title=str(titles[i]))
        ax.set_xticks([])
        ax.set_yticks([])
        arr = _to_numpy(img)
        ax.imshow(rescale_for_display(arr), cmap=None if arr.ndim == 3 else "gray")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def debug_plot(gen_input: Any, path: Optional[str] = None):
    """(1,H,W,2C) packed generator input -> C image channels over C label planes."""
    plt = _plt()
    t = _to_numpy(gen_input)
    c = t.shape[-1] // 2
    fig = plt.figure(figsize=(3 * c, 6))
    for i in range(c):
        ax = fig.add_subplot(2, c, i + 1, title=str(i))
        ax.set_xticks([])
        ax.set_yticks([])
        ax.imshow(t[..., i], cmap="gray")
        ax2 = fig.add_subplot(2, c, c + i + 1, title=f"label {i}")
        ax2.set_xticks([])
        ax2.set_yticks([])
        ax2.imshow(t[..., c + i], cmap="gray", vmin=0, vmax=1)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_single_image(img: Any, title: str = "", path: Optional[str] = None):
    """Single image, or original + per-channel panels for 3-channel inputs."""
    plt = _plt()
    arr = _to_numpy(img)
    if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[-1] == 1):
        fig = plt.figure(figsize=(6, 6))
        plt.imshow(np.squeeze(arr), cmap="gray")
        plt.title(title)
    else:
        fig = plt.figure(figsize=(6, 12))
        names = ["Orig", "Ch1", "Ch2", "Ch3"]
        panels = [arr] + [arr[..., i] for i in range(3)]
        for i, (name, panel) in enumerate(zip(names, panels)):
            ax = fig.add_subplot(4, 1, i + 1, title=name if not title else
                                 (title if i == 0 else name))
            ax.set_xticks([])
            ax.set_yticks([])
            ax.imshow(rescale_for_display(panel),
                      cmap=None if panel.ndim == 3 else "gray")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def save_dataset_hdf5(image_stack: Any, path: str = "./estimated_diffuse_images.hdf5",
                      dataset_name: str = "default") -> int:
    """gzip-9 hdf5 dump (utils.py:143-149 semantics). Returns file size in bytes."""
    import h5py

    with h5py.File(path, "a") as hf:
        hf.create_dataset(dataset_name, data=np.asarray(image_stack),
                          compression="gzip", compression_opts=9)
    return os.path.getsize(path)


def model_summary(params: Any, name: str = "model") -> str:
    """Keras-summary-style parameter table from a Flax param tree."""
    import jax

    lines = [f'Model: "{name}"', "=" * 64,
             f"{'Path':<44}{'Shape':<14}Params", "-" * 64]
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        lines.append(f"{key:<44}{str(tuple(leaf.shape)):<14}{n:,}")
    lines += ["=" * 64, f"Total params: {total:,}"]
    return "\n".join(lines)


def write_model_summaries(g_params: Any, d_params: Any, specseg_vars: Any,
                          out_dir: str = ".") -> None:
    """Write Generator/Discriminator/SpecSeg summary txts (the reference writes
    these on every run, ShmGANwithSSpecSeg.py:916-919,934-935)."""
    os.makedirs(out_dir, exist_ok=True)
    for fname, tree, name in (
            ("Generator_summary.txt", g_params, "SHM_Generator"),
            ("Discriminator_summary.txt", d_params, "SHM_Discriminator"),
            ("SpecSeg_summary.txt", specseg_vars, "SpecSeg")):
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(model_summary(tree, name) + "\n")
