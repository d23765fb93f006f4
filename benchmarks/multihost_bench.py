"""Multi-host scaling efficiency on a CPU mesh (BASELINE row 5 column).

Real TPU pods are not reachable from this machine, so the multi-host
path is measured the same way it is tested (tests/test_multihost.py):
REAL separate processes joined through a jax.distributed coordinator on
the CPU backend, each parsing only its read slice and matching on its
local (dp, shard) mesh. Wall time of the N-process job is the max over
ranks; efficiency = T1 / (N * TN). Parity: rank-ordered concatenation
of per-rank outputs must equal the single-process output byte-for-byte.

Usage: python benchmarks/multihost_bench.py [--reads N] [--genome-bp N]
       [--procs 2]
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = os.path.join(REPO, "benchmarks", "multihost_bench_worker.py")


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def ensure_data(d: str, genome_bp: int, reads: int, patl: int):
    os.makedirs(d, exist_ok=True)
    g = os.path.join(d, "genome.fa")
    r = os.path.join(d, "reads.fa")
    if not (os.path.exists(g) and os.path.exists(r)):
        from benchmarks.gendata import write_random_genome, write_reads_fast
        from real_tpu.io import fasta
        write_random_genome(g, genome_bp, seed=77)
        codes, _ = fasta.parse_genome(g)
        write_reads_fast(r, codes, reads, patl, 0.02, False, seed=78)
    return g, r


def run_procs(nprocs: int, d: str) -> float:
    coord = f"127.0.0.1:{free_port()}"
    # pin every process (including the 1-process baseline) to ONE
    # intra-op thread: XLA CPU otherwise parallelizes the single-process
    # run across all cores, which would misreport N-process scaling on a
    # small host as ~1/N regardless of the actual communication cost.
    # Env must be set at spawn: the sitecustomize imports jax at
    # interpreter start, before the worker can touch os.environ.
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_cpu_multi_thread_eigen=false")
    env["OMP_NUM_THREADS"] = "1"
    env["OPENBLAS_NUM_THREADS"] = "1"
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(nprocs), str(p), d],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, env=env)
        for p in range(nprocs)]
    for p in procs:
        _, err = p.communicate(timeout=3600)
        if p.returncode != 0:
            raise RuntimeError(err.decode()[-2000:])
    return time.perf_counter() - t0


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--genome-bp", type=int, default=12_000_000)
    ap.add_argument("--patl", type=int, default=100)
    ap.add_argument("--procs", type=int, default=2)
    args = ap.parse_args()
    d = os.path.join(REPO, ".bench_data", "mh")
    ensure_data(d, args.genome_bp, args.reads, args.patl)

    run_procs(1, d)                      # warm the persistent jit cache
    t1 = run_procs(1, d)
    single = open(os.path.join(d, "out_0.txt")).read()

    run_procs(args.procs, d)
    tn = run_procs(args.procs, d)
    multi = "".join(open(os.path.join(d, f"out_{p}.txt")).read()
                    for p in range(args.procs))
    eff = t1 / (args.procs * tn)
    print(json.dumps({
        "reads": args.reads, "genome_bp": args.genome_bp,
        "procs": args.procs,
        "t1_s": round(t1, 2), "tn_s": round(tn, 2),
        "scaling_efficiency": round(eff, 3),
        "parity": "byte-identical" if multi == single else "MISMATCH",
    }))


if __name__ == "__main__":
    main()
