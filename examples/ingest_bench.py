"""A/B ingest benchmark: native C++ decode path vs the PIL thread pool.

Measures the host-side dataset ingest that feeds training — the analogue of the
reference's tf.data C++ pipeline (datasetLoader.py:18-170). Writes a PPM fixture
tree (the native decoder's preferred format), then times
data/loader.decode_resize_batch with the native path allowed vs forced-PIL.

Usage: python examples/ingest_bench.py [--n 200] [--size 512] [--decode_to 128]
Prints one JSON line; pass --out to also write it to a file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200, help="images per view folder")
    p.add_argument("--size", type=int, default=512, help="stored image size")
    p.add_argument("--decode_to", type=int, default=128, help="target size")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", type=str, default="")
    a = p.parse_args(argv)

    from shmgan_tpu.data.loader import decode_resize_batch
    from shmgan_tpu.data.synthetic import write_fixture_tree
    from shmgan_tpu.runtime.native_loader import native_available

    if not native_available():
        print(json.dumps({"error": "native library unavailable"}))
        return 1

    with tempfile.TemporaryDirectory() as root:
        write_fixture_tree(root, a.n, a.size, fmt="ppm",
                           view_dirs=("I0",), write_ed=False)
        paths = sorted(os.path.join(root, "I0", f)
                       for f in os.listdir(os.path.join(root, "I0")))

        def run(allow_native):
            best = float("inf")
            for _ in range(a.repeats):
                t0 = time.perf_counter()
                arr, used = decode_resize_batch(paths, a.decode_to,
                                                num_workers=a.workers,
                                                allow_native=allow_native)
                best = min(best, time.perf_counter() - t0)
            return best, used

        t_native, used_native = run(True)
        t_pil, used_pil = run(False)
        assert used_native and not used_pil

    result = {
        "n_images": a.n, "stored_px": a.size, "decoded_px": a.decode_to,
        "workers": a.workers,
        "native_images_per_sec": round(a.n / t_native, 1),
        "pil_images_per_sec": round(a.n / t_pil, 1),
        "native_speedup": round(t_pil / t_native, 2),
    }
    line = json.dumps(result)
    print(line)
    if a.out:
        with open(a.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
