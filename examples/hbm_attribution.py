"""Per-op HBM byte attribution of the fused train step (VERDICT r2 next #2).

The roofline work (DESIGN.md §8) measured the step HBM-bound at ~70% of the
819 GB/s roofline; this tool says WHERE the bytes go. It compiles the train
step, walks the optimized HLO's ENTRY computation, and charges each top-level
instruction its output bytes plus the bytes of every distinct operand buffer
it reads (operands are materialized HBM buffers by construction at the
top level — values internal to a fusion never touch HBM). Grouping keys:

  * opcode class (fusion / convolution / copy / reduce / ...)
  * the leading jax scope in the op_name metadata (generator / discriminator /
    specseg / transpose-grad scopes / adam update / losses)

This is a static model of traffic — it assumes every top-level buffer is an
HBM round-trip, ignoring cache reuse — so it slightly OVERcounts relative to
XLA's own `bytes accessed` total; the per-op ranking is what matters.

Usage (TPU, counts as the one allowed client):
  python examples/hbm_attribution.py --batch 24 --dtype bfloat16 \
      --out benchmarks/trace_r3/hbm_attribution_b24.json
CPU smoke:
  python examples/hbm_attribution.py --cpu --image_size 32 --filter_size 8 \
      --specseg_base_filters 4 --batch 2 --out /tmp/attr.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples by summing parts)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*((?:\([^=]*?\)|[a-z0-9]+\[[0-9,]*\]\S*))\s*"
    r"([\w\-]+)\(")
_OPERAND_RE = re.compile(r"%?([\w.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def parse_entry(hlo_text: str):
    """Yield (name, shape_str, opcode, operand_names, op_name) for every
    instruction in the ENTRY computation of the optimized HLO."""
    lines = hlo_text.splitlines()
    in_entry = False
    depth = 0
    for line in lines:
        if line.startswith("ENTRY "):
            in_entry = True
            depth = line.count("{") - line.count("}")
            continue
        if not in_entry:
            continue
        depth += line.count("{") - line.count("}")
        if depth <= 0:
            break
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, opcode = m.groups()
        name = name.lstrip("%")
        # operands: the first parenthesized argument list after the opcode
        rest = line[m.end():]
        par = rest.split(")", 1)[0]
        operands = []
        for tok in par.split(","):
            tok = tok.strip()
            om = _OPERAND_RE.match(tok)
            if om:
                operands.append(om.group(1))
        opn = _OPNAME_RE.search(line)
        yield name, shape_str, opcode, operands, (opn.group(1) if opn else "")


def scope_of(op_name: str) -> str:
    """Collapse a jax op_name metadata path to a coarse scope bucket."""
    if not op_name:
        return "(none)"
    # op_name like "jit(step_fn)/jit(main)/transpose(...)/Generator_0/..."
    for key, label in (
            ("SpecSeg", "specseg"),
            ("Generator", "generator"),
            ("Discriminator", "discriminator"),
            ("scale_by_adam", "adam"),
            ("clamp", "optimizer"),
            ("ssim", "loss:ssim"),
            ("nst", "loss:nst"),
    ):
        if key.lower() in op_name.lower():
            grad = "transpose(" in op_name or "/vjp" in op_name
            return f"{label}{':bwd' if grad else ':fwd'}" \
                if label in ("generator", "discriminator", "specseg") else label
    return "other"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--filter_size", type=int, default=64)
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--remat", choices=["none", "models"], default="none")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", type=str,
                   default="benchmarks/trace_r3/hbm_attribution.json")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic import synth_polar_batch
    from shmgan_tpu.train.state import create_train_state
    from shmgan_tpu.train.step import make_train_step

    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=a.image_size, compute_dtype=a.dtype,
        filter_size=a.filter_size,
        specseg_base_filters=a.specseg_base_filters)
    cfg.train = dataclasses.replace(cfg.train, batch_size=a.batch,
                                    remat=a.remat)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    views = jnp.asarray(synth_polar_batch(a.batch, a.image_size, seed=0))
    compiled = jax.jit(make_train_step(cfg), donate_argnums=(0,)).lower(
        state, views, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    hlo = compiled.as_text()

    size_of = {}
    rows = []
    for name, shape_str, opcode, operands, op_name in parse_entry(hlo):
        out_b = shape_bytes(shape_str)
        size_of[name] = out_b
        rows.append((name, opcode, operands, op_name, out_b))

    by_opcode = defaultdict(lambda: [0, 0])     # opcode -> [bytes, count]
    by_scope = defaultdict(lambda: [0, 0])
    instr_rows = []
    total = 0
    for name, opcode, operands, op_name, out_b in rows:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue  # no data movement of their own
        read_b = sum(size_of.get(o, 0) for o in set(operands))
        traffic = out_b + read_b
        total += traffic
        by_opcode[opcode][0] += traffic
        by_opcode[opcode][1] += 1
        sc = scope_of(op_name)
        by_scope[sc][0] += traffic
        by_scope[sc][1] += 1
        instr_rows.append({"name": name, "opcode": opcode, "scope": sc,
                           "gb": traffic / 1e9, "out_gb": out_b / 1e9,
                           "op_name": op_name[:160]})

    instr_rows.sort(key=lambda r: -r["gb"])
    result = {
        "config": {"batch": a.batch, "image_size": a.image_size,
                   "dtype": a.dtype, "remat": a.remat},
        "xla_bytes_accessed_per_step": float(cost.get("bytes accessed", 0.0)),
        "static_model_total_gb": round(total / 1e9, 2),
        "by_scope_gb": {k: [round(v[0] / 1e9, 2), v[1]]
                        for k, v in sorted(by_scope.items(),
                                           key=lambda kv: -kv[1][0])},
        "by_opcode_gb": {k: [round(v[0] / 1e9, 2), v[1]]
                         for k, v in sorted(by_opcode.items(),
                                            key=lambda kv: -kv[1][0])},
        "top_instructions": [
            {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in r.items()} for r in instr_rows[:a.top]],
        "n_entry_instructions": len(instr_rows),
    }
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("xla_bytes_accessed_per_step", "static_model_total_gb",
                       "by_scope_gb")}, indent=1))
    print(f"-> {a.out}")


if __name__ == "__main__":
    main()
