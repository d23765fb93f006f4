"""Benchmark: aligned reads/s on the north-star workload (BASELINE.md) —
100bp reads, k<=5, unique-best, scores on, E. coli-scale genome (4.6 Mbp).

Prints ONE JSON line:
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s",
   "vs_baseline": N}

vs_baseline = our throughput / reference-binary throughput on this host's
CPU (all cores). The reference timing is measured once and cached in
.bench_data/baseline.json. Our timing excludes jit compilation (one warmup
pass) but includes read packing, device transfer, index build, matching and
the final state fetch — i.e. everything the reference spends wall-clock on
after its input files are in page cache.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, ".bench_data")
GENOME_N = 4_600_000
NUM_READS = 100_000
PATL = 100
ERRPROB = 0.02
SEED = 12345


def ensure_data():
    os.makedirs(DATA, exist_ok=True)
    g = os.path.join(DATA, "genome.fa")
    r = os.path.join(DATA, "reads.fa")
    if not (os.path.exists(g) and os.path.exists(r)):
        from real_tpu.io import fasta
        from real_tpu.tools import simulate
        sys.stderr.write("generating bench data...\n")
        with open(g, "w") as f:
            f.write(simulate.random_genome(GENOME_N, seed=SEED))
        codes, _ = fasta.parse_genome(g)
        rds = simulate.generate_reads(codes, NUM_READS, PATL, ERRPROB,
                                      False, seed=SEED + 1)
        simulate.write_reads(rds, r, False)
    return g, r


def reference_baseline(g, r):
    cache = os.path.join(DATA, "baseline.json")
    key = f"{GENOME_N}-{NUM_READS}-{PATL}-{ERRPROB}-{SEED}"
    if os.path.exists(cache):
        d = json.load(open(cache))
        if d.get("key") == key:
            return d["reads_per_sec"]
    ref = os.path.join(REPO, ".refbuild", "src", "real")
    if not os.path.exists(ref):
        return None
    out = os.path.join(DATA, "ref.out")
    t0 = time.perf_counter()
    subprocess.run([ref, "-t", g, "-p", r, "-o", out],
                   check=True, capture_output=True)
    dt = time.perf_counter() - t0
    rps = NUM_READS / dt
    json.dump({"key": key, "reads_per_sec": rps, "seconds": dt},
              open(cache, "w"))
    return rps


def ours(g, r):
    import jax

    from real_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from real_tpu.config import RealConfig
    from real_tpu.engine import driver
    from real_tpu.io import reads as reads_io

    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=8192)
    rs = reads_io.parse_reads(r)
    texts = driver.load_texts(cfg)

    # warmup: compile all shapes with a tiny read subset padded to the same
    # batch shapes is not possible (shapes depend on count), so run the full
    # pipeline once for compile, then time the second run.
    driver.run_match_unique(cfg, rs, texts)
    t0 = time.perf_counter()
    result = driver.run_match_unique(cfg, rs, texts)
    dt = time.perf_counter() - t0
    matched = int(((result.st == 1) | (result.st == 2)).sum())
    sys.stderr.write(f"ours: {dt:.3f}s for {rs.num_reads} reads "
                     f"({matched} unique)\n")
    return rs.num_reads / dt


def main():
    g, r = ensure_data()
    base = reference_baseline(g, r)
    if base:
        sys.stderr.write(f"reference: {base:.0f} reads/s\n")
    rps = ours(g, r)
    print(json.dumps({
        "metric": "reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / base, 3) if base else None,
    }))


if __name__ == "__main__":
    main()
