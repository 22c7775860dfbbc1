"""Device setup report — the TPU-native analogue of the reference's check_gpu
(utils.py:37-66: GPU listing, memory growth, thread knobs, TF32, grappler flags).

On JAX/TPU there is nothing to 'enable': XLA owns scheduling and memory. What
remains useful is an honest report of what is attached, which this provides.
"""

from __future__ import annotations

from typing import Dict, List

import jax


def device_report() -> Dict:
    devices = jax.devices()
    rows: List[Dict] = []
    for d in devices:
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        rows.append({
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "?"),
            "process": getattr(d, "process_index", 0),
            "hbm_limit_gb": round(stats.get("bytes_limit", 0) / 2 ** 30, 2),
            "hbm_in_use_mb": round(stats.get("bytes_in_use", 0) / 2 ** 20, 1),
        })
    return {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "process_count": jax.process_count(),
        "devices": rows,
    }


def print_device_report() -> None:
    rep = device_report()
    print(f"[devices] backend={rep['backend']} count={rep['device_count']} "
          f"processes={rep['process_count']}")
    for d in rep["devices"]:
        print(f"  - #{d['id']} {d['kind']} ({d['platform']}) "
              f"hbm={d['hbm_limit_gb']}GB in_use={d['hbm_in_use_mb']}MB")
