"""Evaluation metrics harness — the parity oracle.

Replicates the reference's measured metrics (test.py:332-366): SSIM (max_val=5 on
min-max-rescaled tensors, :336), PSNR (max_val=1, :342), MSE (:346-347), deltaE76 and
deltaE94 on CIE Lab (:351-354, there via skimage through tf.py_function; here pure
JAX — one jitted call per pair, no host round-trip), plus the tabulated per-image and
mean report (:371-381) and the metric dumps (:385-392, jsonl instead of pickle).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.ops.color import delta_e_76, delta_e_94, rgb_to_lab
from shmgan_tpu.ops.ssim import psnr as psnr_fn
from shmgan_tpu.ops.ssim import ssim as ssim_fn
from shmgan_tpu.ops.standardize import rescale_01_per_image


@jax.jit
def evaluate_pair(generated: jnp.ndarray, target: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-image metrics for (B,H,W,3) RGB pairs. Returns dict of (B,) arrays."""
    g = generated.astype(jnp.float32)
    t = target.astype(jnp.float32)
    ssim = ssim_fn(rescale_01_per_image(g), rescale_01_per_image(t), max_val=5.0)
    psnr = psnr_fn(g, t, max_val=1.0)
    mse = jnp.mean(jnp.square(g - t), axis=(1, 2, 3))
    lab_g = rgb_to_lab(jnp.clip(g, 0.0, 1.0))
    lab_t = rgb_to_lab(jnp.clip(t, 0.0, 1.0))
    de76 = jnp.mean(delta_e_76(lab_g, lab_t), axis=(1, 2))
    de94 = jnp.mean(delta_e_94(lab_g, lab_t), axis=(1, 2))
    return {"ssim": ssim, "psnr": psnr, "mse": mse, "deltaE76": de76,
            "deltaE94": de94}


class MetricAccumulator:
    """Collects per-image rows and renders the reference-style report."""

    COLUMNS = ("time", "mse", "ssim", "psnr", "deltaE76", "deltaE94")

    def __init__(self):
        self.rows: List[Dict[str, float]] = []

    def add(self, metrics: Dict[str, jnp.ndarray],
            wall_time: Optional[float] = None):
        batch = int(np.asarray(metrics["ssim"]).shape[0])
        for i in range(batch):
            row = {k: float(np.asarray(v)[i]) for k, v in metrics.items()}
            row["time"] = float(wall_time) if wall_time is not None else float("nan")
            self.rows.append(row)

    def means(self) -> Dict[str, float]:
        if not self.rows:
            return {}
        return {c: float(np.mean([r[c] for r in self.rows])) for c in self.COLUMNS}

    def report(self) -> str:
        """Tabulated per-image + mean metrics (test.py:371-381)."""
        try:
            from tabulate import tabulate
        except ImportError:  # pragma: no cover
            tabulate = None
        header = ["Image#"] + list(self.COLUMNS)
        table = [[i + 1] + [r[c] for c in self.COLUMNS]
                 for i, r in enumerate(self.rows)]
        means = self.means()
        mean_row = [["MEAN"] + [means[c] for c in self.COLUMNS]]
        if tabulate is not None:
            return (tabulate(table, headers=header) + "\n\n--- MEAN METRICS ---\n"
                    + tabulate(mean_row, headers=header))
        lines = ["\t".join(header)]
        lines += ["\t".join(str(x) for x in row) for row in table + mean_row]
        return "\n".join(lines)

    def dump_jsonl(self, path: str):
        with open(path, "w") as f:
            for i, row in enumerate(self.rows):
                f.write(json.dumps({"image": i + 1, **row}) + "\n")
            f.write(json.dumps({"mean": self.means()}) + "\n")
