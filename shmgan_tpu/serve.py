"""Batch inference engine — the deployable serving path.

The reference's "serving" is test.py's per-image eager loop with host round-trips.
This engine compiles the fused mask->generator graph ONCE at a fixed batch size,
keeps weights device-resident, pads partial batches to the compiled shape (no
recompiles, ever), and overlaps host IO with device compute via a worker pool.

    engine = BatchInferenceEngine(cfg, state.g_params, state.specseg_vars)
    outputs = engine.process_images(rgb_batch)          # numpy in, numpy out
    engine.process_folder(in_dir, out_dir)              # end-to-end folder job
    engine.watch_folder(in_dir, out_dir, poll_s=1.0)    # daemon mode
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.config import Config
from shmgan_tpu.data.loader import decode_original, decode_resize, list_images
from shmgan_tpu.infer import make_infer_fn, make_native_infer_fn


class BatchInferenceEngine:
    def __init__(self, cfg: Config, g_params, specseg_vars, batch_size: int = 8,
                 with_cyclic: bool = False, num_io_workers: int = 4,
                 native_resolution: bool = False, outputs=None,
                 data_parallel: int = 1):
        self.cfg = cfg
        self.batch_size = batch_size
        # data_parallel shards every compiled batch over a 1-D device mesh
        # (weights replicated; no collectives — inference is per-image).
        # batch_size stays the GLOBAL batch; each chip runs batch/n.
        if data_parallel > 1 and batch_size % data_parallel:
            raise ValueError(f"batch_size {batch_size} must divide "
                             f"data_parallel {data_parallel}")
        self.image_size = cfg.model.image_size
        # native_resolution serves each photo at its own size (reflect-pad to
        # a bucketed shape + crop, like test-mode --native_resolution) instead
        # of the reference's forced square resize (test.py:81-94). One XLA
        # compile per (bucketed shape, chunk size) — bucketing bounds the set.
        self.native_resolution = native_resolution
        # outputs: restrict the compiled graph to the keys this deployment
        # actually consumes (XLA prunes the rest — fewer full-resolution HBM
        # writes per call). None keeps every output.
        self._native = (make_native_infer_fn(cfg, with_cyclic=with_cyclic,
                                             outputs=outputs,
                                             data_parallel=data_parallel)
                        if native_resolution else None)
        self._infer = make_infer_fn(cfg, with_cyclic=with_cyclic,
                                    outputs=outputs,
                                    data_parallel=data_parallel)
        # weights stay resident on device for the engine's lifetime
        self._g_params = jax.device_put(g_params)
        self._specseg_vars = jax.device_put(specseg_vars)
        self._io = ThreadPoolExecutor(max_workers=num_io_workers)

    def warmup(self) -> None:
        """Force-compile the inference graph with a dummy batch so the first
        real request doesn't pay the XLA compile (20-40s over this rig's
        relay). Idempotent — the jit cache makes repeat calls free."""
        dummy = np.zeros((self.batch_size, self.image_size, self.image_size, 3),
                         np.float32)
        if self.native_resolution:
            # warm the native path's cache at the square bucket; other buckets
            # still compile on first sight (unavoidable — shapes are static)
            self.process_images_native(list(dummy))
        else:
            self.process_images(dummy)

    # -- core ---------------------------------------------------------------

    def process_images(self, rgb: np.ndarray) -> Dict[str, np.ndarray]:
        """(N, H, W, 3) float32 [0,1] -> dict of numpy outputs (N leading dim).

        N may be anything; batches are padded to the compiled batch size so the
        jit never re-traces.
        """
        n = rgb.shape[0]
        outs = []
        for i in range(0, n, self.batch_size):
            chunk = rgb[i:i + self.batch_size]
            real = chunk.shape[0]
            if real < self.batch_size:
                pad = np.zeros((self.batch_size - real,) + chunk.shape[1:],
                               chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            out = self._infer(self._g_params, self._specseg_vars,
                              jnp.asarray(chunk))
            # trim padding from every batch-leading output
            outs.append({k: np.asarray(v)[:real]
                         if np.ndim(v) and np.shape(v)[0] == self.batch_size else
                         np.asarray(v)
                         for k, v in out.items()})
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def process_images_native(self, images) -> list:
        """List of (h, w, 3) float32 [0,1] arrays (ANY sizes) -> list of
        per-image output dicts, order-preserving.

        Images are grouped by exact (h, w); each group runs through the
        native-resolution inference in chunks of the compiled batch size
        (padded with zeros, trimmed after), so the jit cache is keyed only on
        (bucketed shape, batch) — a folder of same-camera photos compiles
        once."""
        if self._native is None:
            raise RuntimeError("engine was built with native_resolution=False")
        groups: Dict[tuple, list] = {}
        for idx, img in enumerate(images):
            groups.setdefault(img.shape[:2], []).append(idx)
        results: list = [None] * len(images)
        for _hw, idxs in groups.items():
            stack = np.stack([images[i] for i in idxs])
            for c0 in range(0, len(idxs), self.batch_size):
                chunk = stack[c0:c0 + self.batch_size]
                real = chunk.shape[0]
                if real < self.batch_size:
                    pad = np.zeros((self.batch_size - real,) + chunk.shape[1:],
                                   chunk.dtype)
                    chunk = np.concatenate([chunk, pad])
                out = self._native(self._g_params, self._specseg_vars, chunk)
                for j in range(real):
                    results[idxs[c0 + j]] = {
                        k: v[j] if np.ndim(v) and
                        np.shape(v)[0] == self.batch_size else v
                        for k, v in out.items()}
        return results

    # -- folder jobs ----------------------------------------------------------

    def _save_outputs(self, out: Dict[str, np.ndarray], names, out_dir: str,
                      save_mask: bool, debug_stretch: bool = False):
        """Save the CALIBRATED specular-free image — the exact inverse of the
        input standardization, living in the input's [0,1] RGB domain (the
        product output; the reference's de-normalization at test.py:246-250 never
        closes this loop). debug_stretch additionally writes the min-max
        contrast-stretched raw generator output for inspection."""
        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        gen = out["gen_rgb_calibrated"]
        for j, name in enumerate(names):
            base = os.path.splitext(os.path.basename(name))[0]
            Image.fromarray(
                (np.clip(gen[j], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{base}_specfree.png"))
            if save_mask:
                m = (np.clip(out["mask"][j, ..., 0], 0, 1) * 255).astype(np.uint8)
                Image.fromarray(m).save(os.path.join(out_dir, f"{base}_mask.png"))
            if debug_stretch:
                img = out["gen_rgb"][j]
                lo, hi = img.min(), img.max()
                vis = (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)
                Image.fromarray((vis * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"{base}_stretch.png"))

    def process_folder(self, in_dir: str, out_dir: str,
                       save_mask: bool = True) -> int:
        files = list_images(in_dir)
        return len(self._process_files(files, out_dir, save_mask))

    def _process_files(self, files, out_dir: str, save_mask: bool) -> list:
        """Decode + infer + save; returns the files that decoded successfully.
        A file mid-write or corrupt is skipped (not an error) so the caller can
        retry it on a later poll (ADVICE.md round 1)."""
        if not files:
            return []
        def _try_decode(p):
            try:
                if self.native_resolution:
                    return decode_original(p)
                return decode_resize(p, self.image_size)
            except Exception:
                return None
        decoded = list(self._io.map(_try_decode, files))
        ok = [(f, d) for f, d in zip(files, decoded) if d is not None]
        if not ok:
            return []
        ok_files = [f for f, _ in ok]
        if self.native_resolution:
            outs = self.process_images_native([d for _, d in ok])
            for f, out in zip(ok_files, outs):
                self._save_outputs({k: v[None] for k, v in out.items()},
                                   [f], out_dir, save_mask)
        else:
            out = self.process_images(np.stack([d for _, d in ok]))
            self._save_outputs(out, ok_files, out_dir, save_mask)
        return ok_files

    def watch_folder(self, in_dir: str, out_dir: str, poll_s: float = 1.0,
                     save_mask: bool = True, max_iterations: Optional[int] = None):
        """Daemon mode: poll in_dir, process new images as they arrive.

        A file is only picked up once its (size, mtime) is stable across two
        polls — a producer still writing it would otherwise be decoded mid-write
        (ADVICE.md round 1). Failed decodes are retried on later polls.
        max_iterations bounds the loop for tests; None runs forever."""
        seen: Set[str] = set()
        pending: Dict[str, tuple] = {}
        it = 0
        while max_iterations is None or it < max_iterations:
            stable = []
            current = set(list_images(in_dir))
            # prune state for files that disappeared (rotated/deleted by the
            # producer) — otherwise a write-then-delete producer leaks pending/
            # seen entries unboundedly over a long-running daemon (ADVICE r2)
            for gone in [f for f in pending if f not in current]:
                pending.pop(gone, None)
            seen &= current
            for f in sorted(current):
                if f in seen:
                    continue
                try:
                    st = os.stat(f)
                except OSError:
                    continue
                sig = (st.st_size, st.st_mtime_ns)
                if pending.get(f) == sig:
                    stable.append(f)
                pending[f] = sig
            done = self._process_files(stable, out_dir, save_mask) if stable \
                else []
            seen.update(done)
            for f in done:
                pending.pop(f, None)
            if done:
                print(f"[serve] processed {len(done)} image(s)")
            else:
                # nothing succeeded this round (idle, or only persistently
                # undecodable files) — always back off so a corrupt file can't
                # turn the daemon into a busy-spin
                time.sleep(poll_s)
            it += 1
