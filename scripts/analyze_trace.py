"""Summarize a jax.profiler Chrome trace (vm.trace.json.gz) captured on
the TPU: device time by model component, and per-op roofline stats
(achieved TFLOP/s and HBM GB/s from the trace's model_flops /
raw_bytes_accessed annotations).

Usage: python scripts/analyze_trace.py <trace.json.gz> [n_steps]
The committed round-3 evidence trace is
docs/traces/r3_train_step_b32_128px.trace.json.gz (8 steps of the
bench.py flagship config: ESRGAN 4x GAN step, batch 32, 128px HR,
single v5e chip).
"""

from __future__ import annotations

import collections
import gzip
import json
import re
import sys


def load_device_ops(path: str):
    d = json.load(gzip.open(path) if path.endswith(".gz") else open(path))
    evs = d["traceEvents"] if isinstance(d, dict) else d
    tnames = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = {p for (p, _t), n in tnames.items() if "TPU" in str(n)} | {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))}
    ops_tids = {(p, t) for (p, t), n in tnames.items()
                if n == "XLA Ops" and p in dev_pids}
    for e in evs:
        if e.get("ph") == "X" and (e["pid"], e.get("tid")) in ops_tids:
            yield e


def component(tf_op: str) -> str:
    m = re.search(r"(transpose\(jvp|jvp)\(([A-Za-z0-9_]+)\)", tf_op or "")
    if not m:
        return "opt/other"
    return f"{m.group(2)}:{'bwd' if m.group(1).startswith('transpose') else 'fwd'}"


def main(path: str, n_steps: int = 8) -> None:
    agg_t = collections.Counter()
    agg_f = collections.Counter()
    tot = 0.0
    for e in load_device_ops(path):
        a = e.get("args", {})
        c = component(a.get("tf_op", ""))
        dur = int(a.get("device_duration_ps", e.get("dur", 0) * 1e6)) / 1e12
        agg_t[c] += dur
        tot += dur
        agg_f[c] += int(a.get("model_flops", 0) or 0)
    print(f"total device {tot * 1e3 / n_steps:.1f} ms/step "
          f"({n_steps} steps traced)")
    for k, v in agg_t.most_common():
        tflops = agg_f[k] / v / 1e12 if v else 0.0
        print(f"  {k:28s} {v * 1e3 / n_steps:7.2f} ms/step "
              f"{100 * v / tot:5.1f}%  {tflops:6.1f} TFLOP/s")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8)
