"""Worker process for tests/test_multihost.py.

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <datadir>

Connects to the jax.distributed coordinator on a CPU backend with 4
virtual devices, matches THIS host's read slice on its local (dp, shard)
mesh, and writes out_<pid>.txt. Concatenating out_0..out_{n-1} in rank
order must equal the single-process output byte-for-byte.
"""

import os
import sys

# the axon sitecustomize imports jax at interpreter start, so env vars are
# too late — switch platform via the live config (tests/conftest.py does
# the same); XLA_FLAGS is still read at backend init, which hasn't happened
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main() -> int:
    coord, nprocs, pid, datadir = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "mesh"
    from real_tpu.parallel import multihost
    topo = multihost.initialize(coordinator_address=coord,
                                num_processes=nprocs, process_id=pid)
    assert topo.process_count == nprocs

    from real_tpu.cli.output import write_unique
    from real_tpu.config import RealConfig
    from real_tpu.engine import driver

    g = os.path.join(datadir, "g.fa")
    r = os.path.join(datadir, "r.fa")
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     batch_size=64, index_shards=2, use_mesh=True)
    if mode == "exchange":
        # de-replicated build: sequential driver + shard exchange
        cfg.use_mesh = False
        cfg.index_shards = 3
        cfg.build_exchange_dir = os.path.join(datadir, "exchange")
    # per-host input sharding: parse only this rank's record slice
    rs = multihost.parse_host_slice(r, topo)
    texts = driver.load_texts(cfg)
    res = driver.run_match_unique(cfg, rs, texts)
    with open(os.path.join(datadir, f"out_{pid}.txt"), "w") as f:
        write_unique(f, rs, res, texts, cfg.scores)
    return 0


if __name__ == "__main__":
    sys.exit(main())
