"""Shared A/B harness: run the reference binary and the TPU engine on the
same inputs and compare outputs."""

import io
import os
import subprocess

import numpy as np

from real_tpu.cli.output import write_all, write_unique
from real_tpu.config import RealConfig
from real_tpu.engine import driver
from real_tpu.io import fasta, reads as reads_io
from real_tpu.tools import simulate


def make_inputs(tmp_path, *, n=20000, numpat=200, patlen=100, errprob=0.02,
                fastq=False, seed=0, n_prob=0.0, num_fragments=1):
    genome_path = str(tmp_path / "genome.fa")
    reads_path = str(tmp_path / ("reads.fq" if fastq else "reads.fa"))
    with open(genome_path, "w") as f:
        f.write(simulate.random_genome(n, seed=seed, n_prob=n_prob,
                                       num_fragments=num_fragments))
    codes, _ranges = fasta.parse_genome(genome_path)
    rds = simulate.generate_reads(codes, numpat, patlen, errprob, fastq,
                                  seed=seed + 1)
    simulate.write_reads(rds, reads_path, fastq)
    return genome_path, reads_path


def run_reference(ref_real, genome, reads, out, extra_args=()):
    cmd = [ref_real, "-t", genome, "-p", reads, "-o", out, "-T", "2",
           *extra_args]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(out) as f:
        return f.read()


def run_ours(genome, reads, *, unique=True, scores=True, seedkmax=2,
             totalkmax=5, seedl=32, index_shards=1, batch_size=512,
             filter_level=2, use_mesh=None, split_limit=None):
    cfg = RealConfig(textfilename=genome, patternfilename=reads,
                     outputfilename="-", match_unique=unique, scores=scores,
                     seedkmax=seedkmax, totalkmax=totalkmax, seedl=seedl,
                     index_shards=index_shards, batch_size=batch_size,
                     filter_level=filter_level, use_mesh=use_mesh)
    rs = reads_io.parse_reads(reads)
    cfg.fastq = rs.fastq
    if split_limit is not None:
        texts = driver.load_texts(cfg, split_limit=split_limit)
    else:
        texts = driver.load_texts(cfg)
    buf = io.StringIO()
    if unique:
        result = driver.run_match_unique(cfg, rs, texts)
        write_unique(buf, rs, result, texts, scores)
    else:
        hits = driver.run_match_all(cfg, rs, texts)
        write_all(buf, rs, hits, texts, scores)
    return buf.getvalue()


def as_record_set(text):
    return sorted(text.rstrip("\n").split("\n")) if text.strip() else []


def ref_flags(*, unique=True, scores=True, seedkmax=2, totalkmax=5,
              seedl=32, filter_level=2):
    return ["-u", str(int(unique)), "-q", str(int(scores)),
            "-s", str(seedkmax), "-e", str(totalkmax), "-l", str(seedl),
            "-filter_level", str(filter_level)]
