"""real_tpu — a TPU-native short-read alignment engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of REAL
(REad ALigner, reference: /root/reference, v0.0.31): align FASTA/FASTQ reads
against a reference genome allowing up to k mismatches (Hamming distance),
using a pigeonhole seed-signature index, with unique-best-hit and all-hits
reporting modes and odds-ratio quality scoring.

Design (TPU-first, not a port):
  * the genome lives in HBM as 2-bit packed uint32 words (16 bases/word),
  * the index is six pair-signature lists built with one vectorized pass and
    `lax.sort` (reference builds them with OpenMP radix sort),
  * candidate verification is XOR + pair-fold + `lax.population_count` on
    uint32 vector lanes (reference: SSE4 popcount, PopCountTable.hpp:113-131),
  * per-read best-hit state is a pure automaton folded with `lax.scan`
    (reference: UpdateUniqueInfo, matchUniqueImplementation.cpp:75-250),
  * multi-chip scaling shards the index across a `jax.sharding.Mesh` and
    merges per-read states with collectives (reference: sequential
    memory-bounded block streaming, matchUniqueImplementation.cpp:1253).
"""

__version__ = "0.1.0"

from real_tpu.config import RealConfig  # noqa: F401
