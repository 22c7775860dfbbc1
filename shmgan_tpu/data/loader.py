"""Polarimetric dataset ingest (host side).

Capability parity with datasetLoader.py:18-170, redesigned for a TPU feed:

  reference: five tf.data image_dataset_from_directory streams (batch 1, no shuffle),
  zipped by file order, /255, a flip map with inverted+frozen polarity, .cache(),
  .repeat(epochs), counting the dataset by materializing a full stream (:168).

  here: the five view folders are listed once and aligned by sorted filename
  (same alignment contract), decoded/resized by a worker pool, cached in RAM as
  float32 (the PSD-scale sets fit comfortably), and served as stacked (V, B, H, W, 3)
  fixed-shape batches ready for jax.device_put. Flip augmentation moved INSIDE the
  jitted train step with explicit PRNG (SURVEY.md §3.4), so the host pipeline is
  deterministic. The pseudo-diffuse ED view is synthesized in-pipeline (channel-wise
  min across the four polarization views, utils.py:68-123) when the ED folder is
  absent — the honest version of the reference's --est_diffuse flag (main.py:36,
  dead there).

An optional native C++ decode/resize path (shmgan_tpu/runtime) can replace the PIL
workers; the Python pool is the portable fallback.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

from shmgan_tpu.config import DataConfig

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".gif")


def list_images(directory: str) -> List[str]:
    """Sorted image paths directly under `directory` and exactly one level of
    subdirs (keras image_dataset_from_directory's class-folder tolerance).
    Deeper nesting is ignored — unbounded recursion could silently merge stray
    images into a view and misalign the 5-view zip (ADVICE.md round 1)."""
    out = []
    try:
        entries = sorted(os.listdir(directory))
    except FileNotFoundError:
        return []
    for e in entries:
        p = os.path.join(directory, e)
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.lower().endswith(_IMG_EXTS) and \
                        os.path.isfile(os.path.join(p, f)):
                    out.append(os.path.join(p, f))
        elif e.lower().endswith(_IMG_EXTS):
            out.append(p)
    return sorted(out)


def decode_resize(path: str, image_size: int) -> np.ndarray:
    """Decode to RGB, bilinear-resize to (image_size, image_size), scale to [0,1].

    Matches the reference pipeline: resize (keras default bilinear) then /255
    (datasetLoader.py:56-60).
    """
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (image_size, image_size):
            im = im.resize((image_size, image_size), Image.BILINEAR)
        return np.asarray(im, dtype=np.float32) / 255.0


class PolarimetricDataset:
    """Aligned 5-view dataset: (I0, I45, I90, I135, ED) or PSD naming.

    Yields (V, B, H, W, 3) float32 batches. Iteration order is deterministic
    (shuffling — absent in the reference, which relies on channel-dropout/label
    randomness instead (ShmGANwithSSpecSeg.py:973-976) — is available via
    `shuffle_seed`).
    """

    def __init__(self, cfg: DataConfig, image_size: int, batch_size: int,
                 num_workers: Optional[int] = None):
        self.cfg = cfg
        self.image_size = image_size
        self.batch_size = batch_size
        self.num_workers = num_workers or cfg.num_workers

        names = cfg.psd_view_dirs if cfg.use_psd_naming else cfg.view_dirs
        self.view_names = list(names)
        paths = [os.path.join(cfg.data_dir, d) for d in self.view_names]

        self.has_ed_folder = os.path.isdir(paths[4])
        if not self.has_ed_folder and not cfg.est_diffuse:
            raise FileNotFoundError(
                f"ED folder {paths[4]} missing and est_diffuse=False")

        n_views = 5 if self.has_ed_folder else 4
        self.files: List[List[str]] = []
        for p in paths[:n_views]:
            fs = list_images(p)
            if not fs:
                raise FileNotFoundError(f"no images under {p}")
            self.files.append(fs)
        n = min(len(f) for f in self.files)
        self.files = [f[:n] for f in self.files]
        self.length = n

        self._cache: Optional[np.ndarray] = None
        if cfg.cache_in_memory:
            self._cache = self._load_all()

    # -- loading -----------------------------------------------------------

    def _load_all(self) -> np.ndarray:
        """Decode everything once -> (V, N, H, W, 3) with ED synthesized if needed."""
        s = self.image_size

        def load_view(view_files):
            with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                return np.stack(list(ex.map(lambda p: decode_resize(p, s), view_files)))

        views = np.stack([load_view(fs) for fs in self.files])  # (4 or 5, N, H, W, 3)
        if views.shape[0] == 4:
            ed = views.min(axis=0, keepdims=True)
            views = np.concatenate([views, ed], axis=0)
        return views

    def _load_indices(self, idx: np.ndarray) -> np.ndarray:
        if self._cache is not None:
            return self._cache[:, idx]
        s = self.image_size
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            views = []
            for fs in self.files:
                batch_files = [fs[i] for i in idx]
                views.append(np.stack(list(
                    ex.map(lambda p: decode_resize(p, s), batch_files))))
        v = np.stack(views)
        if v.shape[0] == 4:
            v = np.concatenate([v, v.min(axis=0, keepdims=True)], axis=0)
        return v

    # -- iteration ---------------------------------------------------------

    def __len__(self) -> int:
        return self.length

    @property
    def batches_per_epoch(self) -> int:
        return self.length // self.batch_size

    def iter_epoch(self, shuffle_seed: Optional[int] = None) -> Iterator[np.ndarray]:
        order = np.arange(self.length)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for b in range(self.batches_per_epoch):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            yield self._load_indices(idx)


class SingleFolderDataset:
    """Flat RGB image folder for inference/eval (test.py:81-94): deterministic order,
    resize + /255, yields (B, H, W, 3)."""

    def __init__(self, directory: str, image_size: int, batch_size: int = 1,
                 num_workers: int = 4, cache: bool = True):
        self.files = list_images(directory)
        if not self.files:
            raise FileNotFoundError(f"no images under {directory}")
        self.image_size = image_size
        self.batch_size = batch_size
        self.num_workers = num_workers
        self._cache: Optional[np.ndarray] = None
        if cache:
            with ThreadPoolExecutor(max_workers=num_workers) as ex:
                self._cache = np.stack(list(
                    ex.map(lambda p: decode_resize(p, image_size), self.files)))

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self) -> Iterator[np.ndarray]:
        n = len(self.files)
        for b in range(0, n, self.batch_size):
            idx = list(range(b, min(b + self.batch_size, n)))
            if self._cache is not None:
                yield self._cache[idx]
            else:
                yield np.stack([decode_resize(self.files[i], self.image_size)
                                for i in idx])
