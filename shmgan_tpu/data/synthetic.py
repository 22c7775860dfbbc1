"""Synthetic polarimetric fixtures.

The real PSD/SHIQ datasets are multi-GB downloads; every test and demo in this repo
runs on generated scenes instead (SURVEY.md §4: "synthetic 5-view fixture datasets").

A scene is a smooth random diffuse image plus view-dependent specular highlights:
polarized specular reflection varies with polarizer angle as Malus-law cos^2, while
the diffuse component is (approximately) unpolarized — so the 4 views share the
diffuse base and differ in highlight strength, and the channel-wise min across views
approximates the diffuse image exactly like the reference's estimated-diffuse op
(utils.py:68-123).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

_VIEW_ANGLES_DEG = (0.0, 45.0, 90.0, 135.0)


def _smooth_noise(rng: np.random.Generator, h: int, w: int, c: int,
                  octaves: int = 3) -> np.ndarray:
    """Cheap multi-octave value noise in [0,1]."""
    out = np.zeros((h, w, c), np.float32)
    for o in range(octaves):
        step = max(1, min(h, w) >> (o + 1))
        gh, gw = max(2, h // step), max(2, w // step)
        coarse = rng.uniform(0, 1, (gh, gw, c)).astype(np.float32)
        ys = np.linspace(0, gh - 1, h)
        xs = np.linspace(0, gw - 1, w)
        y0 = np.clip(ys.astype(int), 0, gh - 2)
        x0 = np.clip(xs.astype(int), 0, gw - 2)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        a = coarse[y0][:, x0]
        b = coarse[y0][:, x0 + 1]
        c_ = coarse[y0 + 1][:, x0]
        d = coarse[y0 + 1][:, x0 + 1]
        interp = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx \
            + c_ * fy * (1 - fx) + d * fy * fx
        out += interp / (2 ** o)
    out /= sum(1.0 / 2 ** o for o in range(octaves))
    return out


def synth_polar_scene(rng: np.random.Generator, h: int, w: int,
                      n_highlights: int = 3):
    """One scene -> (views (4,H,W,3), diffuse (H,W,3), mask (H,W,1))."""
    diffuse = 0.15 + 0.7 * _smooth_noise(rng, h, w, 3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    spec = np.zeros((h, w), np.float32)
    for _ in range(n_highlights):
        cy, cx = rng.uniform(0.15, 0.85) * h, rng.uniform(0.15, 0.85) * w
        sig = rng.uniform(0.02, 0.08) * min(h, w)
        amp = rng.uniform(0.5, 1.0)
        spec += amp * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2)))
    spec = np.clip(spec, 0, 1)
    # polarization phase of the specular component per scene
    phi = rng.uniform(0, np.pi)
    pol_frac = rng.uniform(0.6, 0.95)   # degree of polarization of the highlight
    views = []
    for ang in _VIEW_ANGLES_DEG:
        theta = np.deg2rad(ang)
        # Malus-law modulation of the polarized part; unpolarized part passes 1/2
        gain = (1 - pol_frac) * 0.5 + pol_frac * np.cos(theta - phi) ** 2
        v = np.clip(diffuse + (spec * gain)[..., None], 0, 1)
        views.append(v.astype(np.float32))
    mask = (spec > 0.25).astype(np.float32)[..., None]
    return np.stack(views), diffuse.astype(np.float32), mask


def synth_polar_batch(batch: int, image_size: int, seed: int = 0,
                      include_ed: bool = True) -> np.ndarray:
    """(V, B, H, W, 3) float32 in [0,1]; V=5 with ED as channel-wise min of views."""
    rng = np.random.default_rng(seed)
    views4 = []
    for _ in range(batch):
        v, _, _ = synth_polar_scene(rng, image_size, image_size)
        views4.append(v)
    v4 = np.stack(views4, axis=1)  # (4, B, H, W, 3)
    if not include_ed:
        return v4
    ed = v4.min(axis=0, keepdims=True)  # pseudo-diffuse, utils.py:68-123 semantics
    return np.concatenate([v4, ed], axis=0)


def write_fixture_tree(root: str, n_images: int, image_size: int, seed: int = 0,
                       view_dirs: Sequence[str] = ("I0", "I45", "I90", "I135", "ED"),
                       write_ed: bool = True,
                       fmt: str = "png") -> None:
    """Write an on-disk polarimetric dataset tree the loader can ingest:
    root/I0/*.png ... root/ED/*.png, aligned by filename sort order
    (the reference aligns streams by file order, datasetLoader.py:151)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    dirs = list(view_dirs) if write_ed else list(view_dirs[:4])
    for d in dirs:
        os.makedirs(os.path.join(root, d), exist_ok=True)
    for i in range(n_images):
        views, _, _ = synth_polar_scene(rng, image_size, image_size)
        ed = views.min(axis=0)
        imgs = list(views) + ([ed] if write_ed else [])
        for d, img in zip(dirs, imgs):
            arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(root, d, f"img_{i:05d}.{fmt}"))
