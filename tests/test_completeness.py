"""Truth-based completeness and soundness (SURVEY §4.1).

generate_reads encodes ground truth in each read (origin position,
strand, injected mutations — genpat.cpp:119-137). The pigeonhole
guarantee says: every planted alignment with <= seedkmax errors in the
ENGINE seed region and <= totalkmax total errors MUST be found. The
engine seed is always read[0:seedl] in READ coordinates for both
strands: the reverse probe signatures are the RC of the read's seed
(SignatureConstruction.hpp:347-410), so in genome coordinates an
inverted hit's seed lies at the END of the window, but the mutation
positions encoded in genpat-style names are read-coordinate positions
(mutations are applied after the optional reversal, genpat.cpp:119-137).

Soundness: every hit matchAll reports must verify against the genome
(Hamming distance == k <= totalkmax, seed errors <= seedkmax, inside a
fragment, N-free window).
"""

import numpy as np
import pytest

from real_tpu.config import RealConfig
from real_tpu.engine import driver
from real_tpu.io import fasta, reads as reads_io
from real_tpu.tools import simulate

SEEDL, SEEDK, TOTALK, PATL = 32, 2, 5, 60


@pytest.fixture(scope="module", params=[False, True],
                ids=["seq", "mesh"])
def setup(request, tmp_path_factory):
    d = tmp_path_factory.mktemp("completeness")
    g = str(d / "g.fa")
    r = str(d / "r.fa")
    with open(g, "w") as f:
        f.write(simulate.random_genome(40000, seed=31, num_fragments=2))
    codes, _ = fasta.parse_genome(g)
    rds = simulate.generate_reads(codes, 400, PATL, 0.04, False, seed=32)
    simulate.write_reads(rds, r, False)
    cfg = RealConfig(textfilename=g, patternfilename=r, outputfilename="-",
                     scores=False, seedkmax=SEEDK, totalkmax=TOTALK,
                     seedl=SEEDL, batch_size=256,
                     use_mesh=request.param)
    rs = reads_io.parse_reads(r)
    texts = driver.load_texts(cfg)
    hits = driver.run_match_all(cfg, rs, texts)
    frag_starts = [off for _, off in fasta.parse_genome(g)[1]]
    return codes, rds, hits, frag_starts


def _seed_muts(read, rng_positions):
    """Mutation count inside the engine seed region (read coords)."""
    return sum(1 for j in rng_positions if j < SEEDL)


def _mut_positions(read):
    """Parse the injected-mutation read coordinates out of the name."""
    out = []
    for part in read.name.split("_")[1:]:
        if part == "inv" or part.startswith("length"):
            continue
        out.append(int(part[:-2]))
    return out


def test_every_plantable_hit_found(setup):
    codes, rds, hits, frag_starts = setup
    import bisect
    checked = 0
    for i, rd in enumerate(rds):
        muts = _mut_positions(rd)
        assert len(muts) == rd.nmut
        if rd.nmut > TOTALK or _seed_muts(rd, muts) > SEEDK:
            continue
        # the engine rejects windows crossing fragment boundaries
        # (RangeVector::isPositionValid, RangeVector.hpp:63-80)
        if bisect.bisect_right(frag_starts, rd.pos) != \
           bisect.bisect_right(frag_starts, rd.pos + PATL - 1):
            continue
        got = hits.get(i, [])
        found = [h for h in got
                 if h[1] == rd.pos and h[5] == rd.inverted
                 and h[0] == rd.nmut]
        assert found, (i, rd.name, got[:4])
        checked += 1
    assert checked > 100   # the guarantee was actually exercised


def test_every_reported_hit_verifies(setup):
    codes, rds, hits, _ = setup
    from real_tpu.io.reads import _MAP_TABLE
    total = 0
    for i, lst in hits.items():
        read = _MAP_TABLE[np.frombuffer(rds[i].seq.encode(), np.uint8)]
        rc = (3 - read[::-1]).astype(read.dtype)
        for (k, pos, fid, frag, score, inv) in lst:
            window = codes[pos:pos + PATL]
            pat = rc if inv else read
            assert len(window) == PATL
            d = int((window != pat).sum())
            assert d == k and k <= TOTALK, (i, pos, d, k)
            seed_region = slice(PATL - SEEDL, PATL) if inv \
                else slice(0, SEEDL)
            sd = int((window[seed_region] != pat[seed_region]).sum())
            assert sd <= SEEDK, (i, pos, sd)
            total += 1
    assert total > 300
