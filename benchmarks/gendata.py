"""Fast chunked data generators for the large BASELINE configs (rows 4-5).

tools/simulate.py is the *correctness* harness (truth-encoding names,
per-read Python loop — fine at <=1M reads); these generators are the
*scale* harness: fully vectorized, fixed-width read ids, constant FASTQ
quality, streaming to disk in bounded chunks so 50M x 100bp (12.7 GB
FASTA) and a 3.1 Gbp genome generate in minutes, not hours. Output is
plain FASTA/FASTQ — both engines parse the identical file, so A/B parity
is unaffected by how the data was made.
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REMAP = np.frombuffer(b"ACGTN", dtype=np.uint8)


def write_random_genome(path: str, n: int, seed: int = 0,
                        name: str = "random", num_fragments: int = 1,
                        chunk: int = 60 * 2_000_000) -> None:
    """Random ACGT FASTA, 60 cols, written in bounded chunks."""
    rng = np.random.default_rng(seed)
    per = n // num_fragments
    nl = np.uint8(ord("\n"))
    with open(path, "wb") as f:
        for frag in range(num_fragments):
            m = per if frag < num_fragments - 1 else \
                n - per * (num_fragments - 1)
            f.write(f">{name}_{frag}_{m}\n".encode())
            done = 0
            while done < m:
                c = min(chunk, m - done)
                # emit whole 60-char lines except at fragment end
                c -= c % 60 if done + c < m else 0
                codes = rng.integers(0, 4, c, dtype=np.uint8)
                seq = _REMAP[codes]
                full = c // 60
                mat = np.empty((full, 61), np.uint8)
                mat[:, :60] = seq[:full * 60].reshape(full, 60)
                mat[:, 60] = nl
                blob = mat.tobytes()
                if c % 60:
                    blob += seq[full * 60:].tobytes() + b"\n"
                f.write(blob)
                done += c
    sys.stderr.write(f"genome {path}: {n} bp\n")


def write_reads_fast(path: str, codes: np.ndarray, numpat: int, patl: int,
                     errprob: float, fastq: bool, seed: int = 1,
                     chunk: int = 250_000) -> None:
    """Vectorized read simulator streaming to disk.

    Reads sample uniform positions of `codes` (ACGT only regions assumed),
    half reverse-complemented, each base mutated with prob errprob
    (uniform over the other three bases). Ids are fixed-width 'r%09d' so
    every record has identical byte length -> one byte-matrix per chunk.
    """
    rng = np.random.default_rng(seed)
    n = len(codes)
    numpos = n - patl + 1
    idw = 10                   # 'r' + 9 digits
    nl = np.uint8(ord("\n"))
    with open(path, "wb") as f:
        for lo in range(0, numpat, chunk):
            c = min(chunk, numpat - lo)
            pos = rng.integers(0, numpos, c)
            win = codes[pos[:, None] + np.arange(patl)]
            inv = rng.integers(0, 2, c, dtype=np.uint8).astype(bool)
            rc = 3 - win[:, ::-1]
            win = np.where(inv[:, None], rc, win).astype(np.uint8)
            mut = rng.random((c, patl)) <= errprob
            delta = rng.integers(1, 4, (c, patl), dtype=np.uint8)
            win = np.where(mut, (win + delta) & 3, win)
            seq = _REMAP[win]                       # [c, patl] bytes
            ids = np.frombuffer(
                b"".join(b"r%09d" % i for i in range(lo, lo + c)),
                np.uint8).reshape(c, idw)
            if fastq:
                # @id\nseq\n+\nqual\n  (constant quality '5' <= '6': the
                # first char is decisive for the Sanger-offset autodetect,
                # FastQReader.hpp:229-236)
                w = 1 + idw + 1 + patl + 1 + 2 + patl + 1
                mat = np.empty((c, w), np.uint8)
                mat[:, 0] = ord("@")
                mat[:, 1:1 + idw] = ids
                mat[:, 1 + idw] = nl
                s0 = 2 + idw
                mat[:, s0:s0 + patl] = seq
                mat[:, s0 + patl] = nl
                mat[:, s0 + patl + 1] = ord("+")
                mat[:, s0 + patl + 2] = nl
                q0 = s0 + patl + 3
                mat[:, q0:q0 + patl] = ord("5")
                mat[:, q0 + patl] = nl
            else:
                w = 1 + idw + 1 + patl + 1
                mat = np.empty((c, w), np.uint8)
                mat[:, 0] = ord(">")
                mat[:, 1:1 + idw] = ids
                mat[:, 1 + idw] = nl
                mat[:, 2 + idw:2 + idw + patl] = seq
                mat[:, -1] = nl
            f.write(mat.tobytes())
    sys.stderr.write(f"reads {path}: {numpat} x {patl}bp\n")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genome-bp", type=int, required=True)
    ap.add_argument("--reads", type=int, required=True)
    ap.add_argument("--patl", type=int, default=100)
    ap.add_argument("--errprob", type=float, default=0.02)
    ap.add_argument("--fastq", action="store_true")
    ap.add_argument("--fragments", type=int, default=1)
    ap.add_argument("--seed", type=int, default=4)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    g = os.path.join(args.outdir, "genome.fa")
    r = os.path.join(args.outdir, "reads.fq" if args.fastq else "reads.fa")
    if not os.path.exists(g):
        write_random_genome(g, args.genome_bp, seed=args.seed,
                            num_fragments=args.fragments)
    if not os.path.exists(r):
        from real_tpu.io import fasta
        codes, _ = fasta.parse_genome(g)
        write_reads_fast(r, codes, args.reads, args.patl, args.errprob,
                         args.fastq, seed=args.seed + 1)


if __name__ == "__main__":
    main()
