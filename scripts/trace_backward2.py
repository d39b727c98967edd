"""Categorized device-op breakdown of the flagship train fwd+bwd.

Maps every profiled fusion to its HLO computation (conv variants classified
by shape: forward / data-grad / filter-grad), aggregates device time per
category, and prints per-conv-shape totals — the data that decides where a
Pallas backward attack would pay.

Usage: python scripts/trace_backward2.py [n_iters]
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256
BATCH = 16

sys.path.insert(0, "/root/repo")
from scripts.trace_backward import build_chain  # noqa: E402


def hlo_fusion_map(hlo_text):
    """fusion name -> string describing its dominant instruction(s)."""
    # Parse fused computations: find 'fused_computation' bodies and their
    # callers.  Simpler: for each fusion instruction line, record the called
    # computation name; then inside each computation, look for convolution /
    # dot / reduce lines with shapes.
    comp_ops = defaultdict(list)  # computation name -> interesting op lines
    current = None
    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?([\w\.\-]+)\s*(?:\([^)]*\))?\s*->.*{\s*$", line)
        m2 = re.match(r"\s*(?:ENTRY\s+)?%?([\w\.\-]+)\s+\(", line)
        if line.rstrip().endswith("{") and m2:
            current = m2.group(1)
            continue
        if current is None:
            continue
        if re.search(r"=\s*\S+\s+(convolution|dot)\(", line):
            comp_ops[current].append(line.strip()[:220])
    # fusion instruction -> computation
    fusion_calls = {}
    for m in re.finditer(
            r"%?([\w\.\-]+)\s*=\s*\S+\s+fusion\(.*?calls=%?([\w\.\-]+)",
            hlo_text):
        fusion_calls[m.group(1)] = m.group(2)
    return comp_ops, fusion_calls


def classify_conv(line):
    """Classify an HLO convolution line as fwd / dgrad / wgrad via dims."""
    m = re.search(r"window={size=(\d+)x(\d+)", line)
    size = m.groups() if m else ("?", "?")
    shapes = re.findall(r"(bf16|f32)\[([\d,]+)\]", line)
    return f"conv win={size[0]}x{size[1]} " + " ".join(
        f"{d}[{s}]" for d, s in shapes[:3])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    run, lowered = build_chain(return_lowered=True)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    comp_ops, fusion_calls = hlo_fusion_map(hlo)
    float(run(1e-9, 2))
    tracedir = "/tmp/jaxtrace_bwd2"
    with jax.profiler.trace(tracedir):
        float(run(1e-8, n))

    path = sorted(
        glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    # device lane pids: find process named like TPU / device
    pid_names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()
                or "XLA" in name}
    print("process lanes:", pid_names)
    agg = defaultdict(float)
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name in ("while.3", "jit_chain") or name.startswith("$") \
           or "asarray" in name or name.isdigit() \
           or "(" in name and "jit_chain" in name:
            continue
        agg[name] += e["dur"]

    # categorize
    cat = defaultdict(float)
    detail = defaultdict(float)
    for name, us in agg.items():
        base = name.split("(")[0]
        comp = fusion_calls.get(base)
        ops = comp_ops.get(comp, []) if comp else comp_ops.get(base, [])
        convs = [l for l in ops if " convolution(" in l]
        dots = [l for l in ops if " dot(" in l]
        if convs:
            key = classify_conv(convs[0])
            cat["conv:" + key.split(" ")[1]] += us
            detail[key] += us
        elif dots:
            cat["dot"] += us
        elif "convert_reduce" in base or "reduce" in base:
            cat["reduce"] += us
        else:
            cat["elementwise/other"] += us

    total = sum(agg.values())
    print(f"\ndevice op total: {total/1e3:.1f} ms / {n} iters "
          f"= {total/1e3/n/BATCH:.3f} ms/crop")
    print("\nby category:")
    for k, us in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us/1e3/n/BATCH:7.3f} ms/crop {100*us/total:5.1f}%  {k}")
    print("\ntop conv shapes:")
    for k, us in sorted(detail.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {us/1e3/n/BATCH:7.3f} ms/crop {100*us/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
