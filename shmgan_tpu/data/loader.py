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

Ingest is routed through decode_resize_batch: for PPM/PGM/BMP trees the native
C++ decoder (native/loader.cc via shmgan_tpu/runtime) decodes the whole batch in
one multithreaded call — the analogue of the reference's tf.data C++ host
pipeline — and the PIL thread pool is the portable fallback for png/jpeg and for
any file the native path rejects.
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


def decode_original(path: str) -> np.ndarray:
    """Decode to RGB [0,1] at the file's ORIGINAL resolution (no resize).

    Feeds the native-resolution inference path (infer.make_native_infer_fn) —
    the capability the reference lacks: its test loader force-resizes every
    photo to a square image_size (test.py:81-94), destroying detail."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


# Formats the native C++ decoder (native/loader.cc) handles itself. Everything
# else (png/jpeg) goes through the PIL pool — the portable reference path.
_NATIVE_EXTS = (".ppm", ".pgm", ".bmp")


def decode_resize_batch(paths: List[str], image_size: int,
                        num_workers: int = 4,
                        allow_native: bool = True) -> "tuple[np.ndarray, bool]":
    """Decode a list of files -> ((N, S, S, 3) float32 [0,1], used_native).

    The ingest analogue of the reference's tf.data C++ host pipeline
    (datasetLoader.py:18-170): when every file is a format the native library
    decodes (PPM/PGM/BMP) and libshmgan_native builds, the whole batch is
    decoded+resized+normalized by the multithreaded C++ path in one call;
    otherwise (or for any file the native decoder rejects) the PIL thread pool
    handles it. Numerics match: both resize bilinearly then scale by 1/255.
    """
    if allow_native and paths and \
            all(p.lower().endswith(_NATIVE_EXTS) for p in paths):
        try:
            from shmgan_tpu.runtime.native_loader import (decode_batch,
                                                          native_available)
            if native_available():
                out, ok = decode_batch(paths, image_size,
                                       num_threads=num_workers)
                for i in np.nonzero(ok == 0)[0]:      # per-file fallback
                    out[i] = decode_resize(paths[i], image_size)
                return out, True
        except Exception:
            pass  # fall through to PIL — identical semantics
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        arrs = list(ex.map(lambda p: decode_resize(p, image_size), paths))
    return np.stack(arrs), False


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
        # observability: did the last decode go through the native C++ path?
        self.used_native_decode = False

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
        views = []
        for fs in self.files:                     # (4 or 5, N, H, W, 3)
            arr, used = decode_resize_batch(fs, s, num_workers=self.num_workers)
            self.used_native_decode = used
            views.append(arr)
        views = np.stack(views)
        if views.shape[0] == 4:
            ed = views.min(axis=0, keepdims=True)
            views = np.concatenate([views, ed], axis=0)
        return views

    def _load_indices(self, idx: np.ndarray) -> np.ndarray:
        if self._cache is not None:
            return self._cache[:, idx]
        s = self.image_size
        views = []
        for fs in self.files:
            batch_files = [fs[i] for i in idx]
            arr, used = decode_resize_batch(batch_files, s,
                                            num_workers=self.num_workers)
            self.used_native_decode = used
            views.append(arr)
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

    def iter_epoch(self, shuffle_seed: Optional[int] = None,
                   process_index: int = 0,
                   process_count: int = 1) -> Iterator[np.ndarray]:
        """Yield (V, B_local, H, W, 3) batches.

        Single-process (default): B_local == batch_size (the global batch).
        Multi-host: pass jax.process_index()/jax.process_count(); every process
        walks the SAME global order (derived from shuffle_seed, so no
        cross-host coordination is needed) and decodes only its contiguous
        block of each global batch — process p gets rows
        [p*B/P, (p+1)*B/P), matching put_global_batch's assembly contract.
        """
        if self.batch_size % process_count != 0:
            raise ValueError(
                f"global batch {self.batch_size} not divisible by "
                f"{process_count} processes")
        local = self.batch_size // process_count
        order = np.arange(self.length)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        for b in range(self.batches_per_epoch):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            idx = idx[process_index * local:(process_index + 1) * local]
            yield self._load_indices(idx)


class SingleFolderDataset:
    """Flat RGB image folder for inference/eval (test.py:81-94): deterministic order,
    resize + /255, yields (B, H, W, 3).

    image_size=None keeps each file at its ORIGINAL resolution (batches become
    per-file (1, h, w, 3) — shapes vary, so no stacking/caching); pair with
    infer.make_native_infer_fn."""

    def __init__(self, directory: str, image_size: Optional[int],
                 batch_size: int = 1, num_workers: int = 4, cache: bool = True):
        self.files = list_images(directory)
        if not self.files:
            raise FileNotFoundError(f"no images under {directory}")
        self.image_size = image_size
        self.batch_size = batch_size if image_size is not None else 1
        self.num_workers = num_workers
        self._cache: Optional[np.ndarray] = None
        self.used_native_decode = False
        if cache and image_size is not None:
            self._cache, self.used_native_decode = decode_resize_batch(
                self.files, image_size, num_workers=num_workers)

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self) -> Iterator[np.ndarray]:
        n = len(self.files)
        if self.image_size is None:
            for f in self.files:
                yield decode_original(f)[None]
            return
        for b in range(0, n, self.batch_size):
            idx = list(range(b, min(b + self.batch_size, n)))
            if self._cache is not None:
                yield self._cache[idx]
            else:
                yield np.stack([decode_resize(self.files[i], self.image_size)
                                for i in idx])
