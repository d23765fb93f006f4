"""Worker process for benchmarks/multihost_bench.py.

Usage: python multihost_bench_worker.py <coordinator> <nprocs> <pid> <dir>

CPU backend (the axon sitecustomize ignores JAX_PLATFORMS env, so the
platform is switched via the live config, like tests/conftest.py); one
virtual device per process so 2 processes on a 2-core host measure real
scaling, not oversubscription.
"""

import os
import sys

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main() -> int:
    coord, nprocs, pid, d = (sys.argv[1], int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
    from real_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from real_tpu.parallel import multihost
    topo = multihost.initialize(coordinator_address=coord,
                                num_processes=nprocs, process_id=pid)
    from real_tpu.cli.output import write_unique
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver

    g = os.path.join(d, "genome.fa")
    r = os.path.join(d, "reads.fa")
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     use_mesh=False, watchdog_s=0)   # CPU runs are slow
    if nprocs > 1:
        # de-replicated index build: shard ownership split by rank,
        # exchanged through a per-run directory (unique per coordinator
        # port so stale shards of earlier runs are never reused)
        cfg.build_exchange_dir = os.path.join(
            d, "exchange_" + coord.replace(":", "_").replace("/", "_"))
    rs = multihost.parse_host_slice(r, topo)
    texts = driver.load_texts(cfg)
    res = driver.run_match_unique(cfg, rs, texts)
    with open(os.path.join(d, f"out_{pid}.txt"), "w") as f:
        write_unique(f, rs, res, texts, cfg.scores)
    return 0


if __name__ == "__main__":
    sys.exit(main())
