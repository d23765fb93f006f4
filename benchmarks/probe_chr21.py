"""chr21-shape match-step attribution probe (VERDICT r3 item 1).

Builds the chr21 index on the device, runs ONE production-shaped
match_step batch under a profiler trace, and prints the device-op
breakdown — the measurement that decides where the big-genome perf work
goes. Also times index build and variants (no-scores, no-bisect,
matchall) for attribution by differencing.

Usage: python benchmarks/probe_chr21.py [--config chr21|yeast]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="chr21")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.devtime import devtime
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
    cfgkw = dict(chr21=dict(totalkmax=4), yeast=dict(totalkmax=3))
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=args.batch, **cfgkw[args.config])

    rs = parse_reads_cached(r, 0)
    cfg.fastq = rs.fastq
    texts = driver.load_texts(cfg)
    text = texts[0].packed
    out = {"config": args.config, "n_bases": text.n,
           "num_windows": text.n - cfg.seedl + 1}

    idx = build_index(text, cfg.seedl)
    jax.block_until_ready(idx.sig)
    out["index_build_s"] = round(devtime(
        lambda: jax.block_until_ready(build_index(text, cfg.seedl).sig)), 3)

    tables = score_tables(Scoring())
    steps = driver._bsearch_steps_static(out["num_windows"], cfg.cand_cap,
                                     idx.bucket_bits)
    out["bsearch_steps"] = steps

    source = driver._make_source(cfg, rs, None)
    b = next(iter(source))
    state = initial_state(b.codes.shape[0])
    eps = np.float32(cfg.filter_value(b.patl))

    def step(**kw2):
        kw = driver._step_kwargs(cfg, cfg.cand_cap, cfg.survivor_cap,
                                 "ff", tables)
        kw.update(kw2)

        def f():
            st, _ = match_step(
                idx.sig, idx.pos, idx.bb,
                text.words, text.nbits, text.ncum, text.frag_offsets,
                b.codes, b.quals, b.valid,
                state, jnp.int32(0), eps, idx.sig_hi,
                matchall=False, bsearch_steps=steps, **kw)
            jax.block_until_ready(st.st)
        return f

    total, agg = devtime(step(), detail=True)
    out["match_step_s"] = round(total, 4)
    out["per_1m_reads_s"] = round(total / args.batch * 1e6, 2)
    out["noscores_s"] = round(devtime(step(scores=False)), 4)

    print(json.dumps(out))
    for name, dur in agg.most_common(args.top):
        print(f"  {dur*1e3:8.2f}ms {name[:90]}", file=sys.stderr)


if __name__ == "__main__":
    main()
