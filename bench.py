"""Benchmark: aligned reads/s on the north-star workload (BASELINE.md) —
100bp reads, k<=5, unique-best, scores on, E. coli-scale genome (4.6 Mbp).

Prints ONE JSON line:
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s",
   "vs_baseline": N, "phases": {...}}

vs_baseline = our throughput / reference-binary throughput on this host's
CPU (all cores). The reference timing is measured once and cached in
.bench_data/baseline.json. Our timed region is END-TO-END process work:
read parsing, genome parse+pack, device transfer, index build, matching,
final state fetch, output formatting AND writing the output file — the
same work the reference subprocess pays (its timing additionally includes
~0.1s process startup; ours excludes jit compilation via one warmup run,
since compiles are cached across production runs while the reference
compiles ahead of time)."""

import json
import os
import subprocess
import sys
import time

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


def run_once(cfg, g, r, out_path):
    """The full end-to-end pipeline, returning per-phase seconds."""
    from real_tpu.cli.output import write_unique
    from real_tpu.engine import driver
    from real_tpu.io import reads as reads_io

    ph = {}
    t = time.perf_counter()
    rs = reads_io.parse_reads(r)
    ph["parse_reads"] = time.perf_counter() - t

    t = time.perf_counter()
    texts = driver.load_texts(cfg)
    ph["parse_pack_text"] = time.perf_counter() - t

    t = time.perf_counter()
    result = driver.run_match_unique(cfg, rs, texts)
    ph["match"] = time.perf_counter() - t

    t = time.perf_counter()
    with open(out_path, "w") as f:
        unique = write_unique(f, rs, result, texts, cfg.scores)
    ph["output"] = time.perf_counter() - t
    ph.update({f"match.{k}": v
               for k, v in driver.last_metrics.get("phase_s", {}).items()})
    return ph, unique


def ours(g, r):
    from real_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from real_tpu.config import RealConfig

    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=8192)
    out_path = os.path.join(DATA, "ours.out")
    # warmup: compile everything once; timing below is a fresh full run
    run_once(cfg, g, r, out_path)
    t0 = time.perf_counter()
    ph, unique = run_once(cfg, g, r, out_path)
    dt = time.perf_counter() - t0
    sys.stderr.write(f"ours: {dt:.3f}s end-to-end for {NUM_READS} reads "
                     f"({unique} unique); phases: "
                     + " ".join(f"{k}={v:.3f}s" for k, v in ph.items())
                     + "\n")
    return NUM_READS / dt, {k: round(v, 3) for k, v in ph.items()}


def main():
    g, r = ensure_data()
    base = reference_baseline(g, r)
    if base:
        sys.stderr.write(f"reference: {base:.0f} reads/s\n")
    rps, phases = ours(g, r)
    print(json.dumps({
        "metric": "reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / base, 3) if base else None,
        "phases": phases,
    }))


if __name__ == "__main__":
    main()
