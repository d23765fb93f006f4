"""Phase-level TPU timing probe (BASELINE config 1 shapes).

Times, with explicit block_until_ready around each piece:
  - genome pack + upload
  - index build (the lax.sort) alone
  - match steps alone (resident reads), for several batch sizes
  - optional jax.profiler trace of one shard pass (--trace <dir>)

Prints one JSON line with the breakdown. This is the measurement VERDICT
round-2 item 1 asks for before optimizing further.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="")
    ap.add_argument("--batches", default="8192,32768")
    ap.add_argument("--genome", default=os.path.join(
        REPO, ".bench_data", "genome.fa"))
    ap.add_argument("--reads", default=os.path.join(
        REPO, ".bench_data", "reads.fa"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from real_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver
    from real_tpu.engine.matchstep import initial_state, match_step
    from real_tpu.index.build import build_index
    from real_tpu.io import reads as reads_io
    from real_tpu.scoring.scoring import Scoring, score_tables
    import jax.numpy as jnp
    import numpy as np

    out = {"device": str(jax.devices()[0])}

    rs = reads_io.parse_reads(args.reads)
    cfg = RealConfig(textfilename=args.genome, patternfilename=args.reads,
                     outputfilename="-")
    t0 = time.perf_counter()
    texts = driver.load_texts(cfg)
    text = texts[0].packed
    jax.block_until_ready(text.words)
    out["pack_upload_s"] = round(time.perf_counter() - t0, 4)

    # --- index build alone (compile, then timed) ---
    idx = build_index(text, cfg.seedl)
    jax.block_until_ready(idx.sig)
    t0 = time.perf_counter()
    idx = build_index(text, cfg.seedl)
    jax.block_until_ready(idx.sig)
    out["index_build_s"] = round(time.perf_counter() - t0, 4)
    out["num_windows"] = int(text.n - cfg.seedl + 1)

    tables = score_tables(Scoring())
    steps = driver._bsearch_steps_static(out["num_windows"], cfg.cand_cap,
                                         idx.bucket_bits)
    out["bsearch_steps"] = steps

    for bs in [int(x) for x in args.batches.split(",")]:
        cfg.batch_size = bs
        source = driver._make_source(cfg, rs, None)
        kw = driver._step_kwargs(cfg, cfg.cand_cap, cfg.survivor_cap,
                                 "ff", tables)

        def run_all():
            states = {}
            for bi, b in enumerate(source):
                st = states[bi] if bi in states \
                    else initial_state(b.codes.shape[0])
                eps = np.float32(cfg.filter_value(b.patl))
                states[bi], _ = match_step(
                    idx.sig, idx.pos, idx.bb,
                    text.words, text.nbits, text.ncum, text.frag_offsets,
                    b.codes, b.quals, b.valid,
                    st, jnp.int32(0), eps, idx.sig_hi,
                    matchall=False, bsearch_steps=steps, **kw)
            jax.block_until_ready([s.st for s in states.values()])
            return states

        run_all()                               # compile + warm
        t0 = time.perf_counter()
        states = run_all()
        dt = time.perf_counter() - t0
        out[f"match_steps_s_b{bs}"] = round(dt, 4)
        out[f"reads_per_s_match_b{bs}"] = round(rs.num_reads / dt, 1)

        if args.trace and bs == 8192:
            os.makedirs(args.trace, exist_ok=True)
            with jax.profiler.trace(args.trace):
                run_all()
            out["trace_dir"] = args.trace

    print(json.dumps(out))


if __name__ == "__main__":
    main()
