"""`real`-compatible command line interface.

Flags mirror RealOptions.cpp:142-396 so runs can be A/B'd against the
reference binary:

  real_tpu -t <text.fa|dir> -p <reads> -o <out|-> [-s k_seed] [-e k_total]
           [-l seedl] [-u 0|1] [-q 0|1] [-Q offset] [-f fracmem] [-T threads]
           [-m sortthreads] [-R 0|1] [-g 0|1]
           [-similarity x] [-err x] [-trans x] [-gc x] [-gcmut_bias x]
           [-filter_level 0..4] [-v 0|1 (progress + phase timers)]
"""

from __future__ import annotations

import sys
from typing import List, Optional

from real_tpu.config import RealConfig


def parse_args(argv: List[str]) -> RealConfig:
    cfg = RealConfig()
    i = 0
    flags_with_arg = {
        "-t": ("textfilename", str), "-p": ("patternfilename", str),
        "-o": ("outputfilename", str), "-s": ("seedkmax", int),
        "-e": ("totalkmax", int), "-l": ("seedl", int),
        "-f": ("fracmem", float), "-Q": ("quality_offset", int),
        "-m": ("sort_threads", int),
        "-similarity": ("similarity", float), "-err": ("err", float),
        "-trans": ("trans", float), "-gc": ("gc", float),
        "-gcmut_bias": ("gcmut_bias", float),
        "-filter_level": ("filter_level", int),
        # TPU-engine knobs
        "-B": ("batch_size", int), "-K": ("cand_cap", int),
        "-S": ("survivor_cap", int), "-shards": ("index_shards", int),
        "-ckpt": ("checkpoint", str), "-ckpt_every": ("checkpoint_every",
                                                      int),
        "-trace": ("trace", str), "-metrics": ("metrics_json", str),
        "-watchdog": ("watchdog_s", int),
        "-exchange": ("build_exchange_dir", str),
    }
    bool_flags = {"-u": "match_unique", "-q": "scores",
                  "-R": "rewritepatterns", "-g": "gaps", "-v": "verbose",
                  "-debug": "debug_checks"}
    while i < len(argv):
        a = argv[i]
        if a in flags_with_arg:
            attr, typ = flags_with_arg[a]
            setattr(cfg, attr, typ(argv[i + 1]))
            i += 2
        elif a in bool_flags:
            setattr(cfg, bool_flags[a], bool(int(argv[i + 1])))
            i += 2
        elif a == "-T":
            i += 2   # thread count: no-op on TPU, kept for CLI parity
        elif a in ("-h", "--help"):
            print(__doc__, file=sys.stderr)
            sys.exit(0)
        else:
            print(f"Ignoring argument {a}", file=sys.stderr)
            i += 1
    if not (cfg.textfilename and cfg.patternfilename and cfg.outputfilename):
        print(__doc__, file=sys.stderr)
        raise SystemExit("Mandatory arguments -t/-p/-o missing")
    cfg.validate()
    return cfg


def main(argv: Optional[List[str]] = None) -> int:
    from real_tpu.cli.output import write_all_arrays, write_unique
    from real_tpu.engine import driver
    from real_tpu.io import reads as reads_io
    from real_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_args(sys.argv[1:] if argv is None else argv)

    from real_tpu.io.readstore import parse_reads_cached
    rs = parse_reads_cached(cfg.patternfilename, cfg.quality_offset,
                            rewrite=cfg.rewritepatterns)
    cfg.fastq = rs.fastq
    print(f"pattern file is {'FASTQ' if rs.fastq else 'FASTA'}",
          file=sys.stderr)
    texts = driver.load_texts(cfg)

    if cfg.gaps:
        # the reference ships gapped matching compiled out
        # (#define GAPPED_MATCHING disabled, real.cpp:23, -g hidden at
        # RealOptions.cpp:115-118); see README for the rationale
        print("Warning: gapped matching (-g) is experimental and disabled "
              "in the reference (real.cpp:23); ignoring it.",
              file=sys.stderr)

    import contextlib
    trace_cm = contextlib.nullcontext()
    if cfg.trace:
        import jax
        trace_cm = jax.profiler.trace(cfg.trace)

    import time
    t0 = time.perf_counter()
    if cfg.outputfilename == "-":
        out = sys.stdout
    else:
        out = open(cfg.outputfilename, "w")
    try:
        with trace_cm:
            if cfg.match_unique:
                result = driver.run_match_unique(cfg, rs, texts)
                unique = write_unique(out, rs, result, texts, cfg.scores)
                print(f"unique: {unique}", file=sys.stderr)
            else:
                cols = driver.run_match_all(cfg, rs, texts, as_arrays=True)
                write_all_arrays(out, rs, cols, texts, cfg.scores)
    finally:
        if out is not sys.stdout:
            out.close()
    if cfg.metrics_json:
        import json
        wall = time.perf_counter() - t0
        m = dict(driver.last_metrics)
        from real_tpu import native
        m.update({"wall_s": round(wall, 3), "num_reads": rs.num_reads,
                  "reads_per_sec": round(rs.num_reads / max(wall, 1e-9), 1),
                  "mode": "unique" if cfg.match_unique else "all",
                  # the native C++ formatter/parser/argsort change the
                  # output pass ~7x; a silent fallback to the Python
                  # paths must be visible in the metrics
                  "native_paths_active": native.get_lib() is not None})
        with open(cfg.metrics_json, "w") as f:
            json.dump(m, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
