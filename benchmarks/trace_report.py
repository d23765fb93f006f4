"""Capture a jax.profiler trace of chr21-scale production steps and
derive a committed per-op device-time breakdown (VERDICT r4 weak #6: the
perf story must be re-examinable without TPU access).

Writes benchmarks/artifacts/trace_<config>_r5.json: top device ops by
total time for ONE index build and ONE 32k-read match step, plus the
fetch-timed wall numbers the breakdown should roughly sum to.

Usage: python benchmarks/trace_report.py [--config chr21]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fetch_time(f, *a, reps=3):
    import jax
    import numpy as np
    r = f(*a)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="chr21")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.devtime import _device_ops
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver
    from real_tpu.engine.matchstep import initial_state, match_step
    from real_tpu.index.build import build_index
    from real_tpu.io.readstore import parse_reads_cached
    from real_tpu.scoring.scoring import Scoring, score_tables
    from real_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    d = os.path.join(REPO, ".bench_data", args.config)
    g = os.path.join(d, "genome.fa")
    r = os.path.join(d, "reads.fq")
    if not os.path.exists(r):
        r = os.path.join(d, "reads.fa")
    kw_cfg = dict(chr21=dict(totalkmax=4), yeast=dict(totalkmax=3))
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=32768, **kw_cfg.get(args.config, {}))
    rs = parse_reads_cached(r, 0)
    cfg.fastq = rs.fastq
    texts = driver.load_texts(cfg)
    text = texts[0].packed
    np.asarray(text.words[:1])

    out = {"config": args.config, "device": str(jax.devices()[0]),
           "n_bases": int(text.n), "batch": cfg.batch_size}

    def build():
        return build_index(text, cfg.seedl).sig
    out["build_fetch_s"] = round(fetch_time(build, reps=2), 3)

    idx = build_index(text, cfg.seedl)
    np.asarray(idx.sig[:1])
    tables = score_tables(Scoring())
    steps = driver._bsearch_steps_static(text.n - cfg.seedl + 1,
                                         cfg.cand_cap, idx.bucket_bits)
    source = driver._make_source(cfg, rs, None)
    b = next(iter(source))
    state = initial_state(b.codes.shape[0])
    eps = np.float32(cfg.filter_value(b.patl))
    kw = driver._step_kwargs(cfg, cfg.cand_cap, cfg.survivor_cap, "ff",
                             tables)

    def step():
        st, _ = match_step(
            idx.sig, idx.pos, idx.bb,
            text.words, text.nbits, text.ncum, text.frag_offsets,
            b.codes, b.quals, b.valid,
            state, jnp.int32(0), eps, idx.sig_hi,
            matchall=False, bsearch_steps=steps,
            text_has_n=text.has_n, **kw)
        return st.st
    out["match_step_fetch_s"] = round(fetch_time(step, reps=3), 4)

    # one traced build + one traced step (compiles are already warm)
    import tempfile
    tdir = tempfile.mkdtemp(prefix="trace_report")
    with jax.profiler.trace(tdir):
        np.asarray(build()[:1])
        np.asarray(step()[:1])
        time.sleep(1.0)            # let trailing device ops land
    import collections
    agg = collections.Counter()
    for name, dur in _device_ops(tdir):
        if not name.startswith("jit_"):
            agg[name] += dur
    out["device_ops_top"] = [
        {"op": name[:120], "seconds": round(dur, 5)}
        for name, dur in agg.most_common(args.top)]
    out["device_ops_total_s"] = round(sum(agg.values()), 4)

    art = os.path.join(REPO, "benchmarks", "artifacts")
    os.makedirs(art, exist_ok=True)
    path = os.path.join(art, f"trace_{args.config}_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path,
                      "build_fetch_s": out["build_fetch_s"],
                      "match_step_fetch_s": out["match_step_fetch_s"],
                      "device_ops_total_s": out["device_ops_total_s"]}))


if __name__ == "__main__":
    main()
