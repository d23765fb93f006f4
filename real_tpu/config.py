"""Run configuration, mirroring the reference CLI semantics.

Reference: RealOptions.{hpp,cpp}. Defaults RealOptions.hpp:27-38; clamps and
filter_mult derivation RealOptions.cpp:434-463.
"""

from __future__ import annotations

import dataclasses
import sys


@dataclasses.dataclass
class RealConfig:
    textfilename: str = ""
    patternfilename: str = ""
    outputfilename: str = ""
    seedkmax: int = 2            # -s, max mismatches in seed (hard cap 2)
    totalkmax: int = 5           # -e, max total mismatches (cap 15)
    seedl: int = 32              # -l, seed length (<=64, multiple of 4)
    match_unique: bool = True    # -u 1 unique-best / -u 0 all hits
    fracmem: float = 0.75        # -f, fraction of memory budget (HBM here)
    scores: bool = True          # -q, quality/odds-ratio scoring
    quality_offset: int = 0      # -Q, 0 = autodetect
    rewritepatterns: bool = True # -R, cached packed read store
    sort_threads: int = 2        # -m (unused on TPU; kept for CLI parity)
    filter_level: int = 2        # -filter_level 0..4
    gaps: bool = False           # -g (experimental, disabled in reference too)

    # scoring parameters (Scoring.cpp:204-208 defaults)
    similarity: float = 0.995
    err: float = 0.0
    trans: float = 0.71
    gc: float = 0.41
    gcmut_bias: float = 2.0

    fastq: bool = False          # sniffed from the pattern file

    # --- TPU-engine knobs (no reference equivalent) ---
    batch_size: int = 32768      # reads per device batch (dispatch
                                 # overhead through the tunnel measured
                                 # ~10 ms/batch — 50M-read runs need few,
                                 # large steps; device cost is linear in B)
    # Candidate/survivor caps size the fixed-shape verify lanes. Real
    # genomes average <1 candidate per probe, so small caps keep the
    # gather volume minimal; reads that overflow are automatically rerun
    # with 4x-escalated caps (engine/driver.py), preserving exactness.
    cand_cap: int = 8            # max candidates examined per (read, probe)
    survivor_cap: int = 8        # max verified hits folded per read per step
    resident_reads_bytes: int = 0     # keep packed reads device-resident
                                      # across shard passes up to this many
                                      # bytes (0 = 5% of HBM); above it the
                                      # streaming prefetch pipeline
                                      # (io/pipeline.py) re-streams reads
                                      # per index shard with bounded HBM
    index_shards: int = 0        # index shards; 0 = plan from -f HBM budget
                                 # (parallel/plan.py). Shards beyond the mesh
                                 # shard axis run as sequential passes.
    device_index_build: bool = True   # True: lax.sort on device (fast; one
                                      # cached XLA compile). False: NumPy
                                      # host build — identical output, tested
    use_mesh: object = None           # None = auto (mesh when devices > 1);
                                      # True/False force the mesh/sequential
                                      # driver path (tests cover both)
    checkpoint: str = ""              # -ckpt <path>: save (matchinfo/hits,
                                      # shard cursor) after completed index
                                      # units and resume from it
    checkpoint_every: int = 1         # units between checkpoint saves (the
                                      # save fetches per-batch state D2H —
                                      # raise this at many-shard scale)
    trace: str = ""                   # -trace <dir>: capture a jax.profiler
                                      # trace of the matching run (SURVEY
                                      # §5.1; open with xprof/tensorboard)
    metrics_json: str = ""            # -metrics <path>: write structured
                                      # JSON run metrics (phase timers,
                                      # counts) — SURVEY §5.5
    debug_checks: bool = False        # -debug 1: enable jax_debug_nans for
                                      # the run and assert result invariants
                                      # (state/error/position ranges, finite
                                      # scores) after each driver run —
                                      # SURVEY §5.2's NaN/overflow checks
    verbose: bool = False             # -v: stderr progress (reference prints
                                      # processed/numpat fractions,
                                      # matchUniqueImplementation.cpp:1292)
                                      # + per-phase timers
    build_exchange_dir: str = ""      # -exchange <dir>: multi-process runs
                                      # split index-shard OWNERSHIP by rank
                                      # and exchange built shards through
                                      # this shared directory, so the build
                                      # is 1/P per process instead of
                                      # replicated (parallel/multihost.py
                                      # BuildExchange; SURVEY §5.8)
    watchdog_s: int = 900             # -watchdog <s>: abort loudly if one
                                      # device sync (drain/state fetch)
                                      # exceeds this many seconds — a wedged
                                      # dispatch otherwise hangs forever in
                                      # np.asarray (SURVEY §5.3; r4 config 5
                                      # hit exactly that). 0 disables.

    filter_mult: float = dataclasses.field(init=False, default=0.0)

    def __post_init__(self) -> None:
        self.validate()

    def validate(self) -> None:
        """Apply the reference's clamping rules (RealOptions.cpp:434-463)."""
        if self.seedl > 64:
            self.seedl = 64
            print(f"reduced seed size to {self.seedl} to not exceed 64.",
                  file=sys.stderr)
        if self.seedl % 4:
            self.seedl -= self.seedl % 4
            print(f"reduced seed size to {self.seedl} to have a multiple of 4.",
                  file=sys.stderr)
        if self.seedl < 4:
            raise ValueError("cannot handle seed length < 4")
        if self.seedkmax > 2:
            self.seedkmax = 2
            print(f"reduced number of mismatches in seed to {self.seedkmax} "
                  "as we cannot handle more.", file=sys.stderr)
        if self.totalkmax > 15:
            # reference clamps to the 4-bit error field with a warning
            # (RealOptions.cpp:176-180, UniqueMatchInfo.hpp:58-61)
            self.totalkmax = 15
            print("Warning: reducing maximum amount of errors to 15",
                  file=sys.stderr)
        # filter_mult (RealOptions.cpp:455-463)
        mult = {1: 0.5, 2: 1.0, 3: 2.0, 4: 3.0}.get(self.filter_level, 0.0)
        self.filter_mult = mult * self.totalkmax / 70.0

    def filter_value(self, patl: int) -> float:
        """Epsilon for score-tie detection (RealOptions.hpp:74-77)."""
        return self.filter_mult * patl
