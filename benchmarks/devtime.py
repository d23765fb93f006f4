"""Trace-based device timing: the ONLY reliable timer on the tunneled
device (block_until_ready returns before device work completes under the
axon transport, so wall-clock micro-timings under-report by >100x; see
benchmarks/gatherbench.py history).

devtime(f, *args) runs f once under jax.profiler.trace and returns the
summed duration of device-lane ops (seconds), excluding the jit_* roots
(which envelope their fusions) and infeed/outfeed copies.
"""

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax


def _device_ops(trace_dir):
    fs = glob.glob(os.path.join(trace_dir,
                                "plugins/profile/*/*.trace.json.gz"))
    if not fs:
        return []
    data = json.load(gzip.open(fs[0]))
    evs = data["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    out = []
    for e in evs:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        out.append((e["name"], e["dur"] / 1e6))
    return out


def devtime(f, *args, detail=False):
    """Total device seconds of one f(*args) call (sum of non-root ops)."""
    r = f(*args)                      # warm/compile
    jax.block_until_ready(r)
    d = tempfile.mkdtemp(prefix="devtime")
    try:
        with jax.profiler.trace(d):
            r = f(*args)
            jax.block_until_ready(r)
        ops = _device_ops(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    total = sum(dur for name, dur in ops
                if not name.startswith("jit_") and "copy" not in name)
    if detail:
        agg = collections.Counter()
        for name, dur in ops:
            if not name.startswith("jit_"):
                agg[name] += dur
        return total, agg
    return total
