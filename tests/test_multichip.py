"""Mesh-sharded matching must equal the single-device result exactly
(8 virtual CPU devices; dp x shard meshes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real_tpu.engine.matchstep import initial_state, match_step
from real_tpu.index.build import build_index
from real_tpu.io import fasta
from real_tpu.parallel.mesh import (build_sharded_index, make_mesh,
                                    sharded_match_step)
from real_tpu.scoring.scoring import Scoring, score_tables
from real_tpu.text.packed import build_packed_text
from real_tpu.tools import simulate


@pytest.fixture(scope="module")
def setup():
    import tempfile, os
    d = tempfile.mkdtemp()
    g = os.path.join(d, "g.fa")
    with open(g, "w") as f:
        f.write(simulate.random_genome(30000, seed=21, num_fragments=3))
    codes, ranges = fasta.parse_genome(g)
    text = build_packed_text(codes, ranges)
    rds = simulate.generate_reads(codes, 256, 80, 0.03, False, seed=22)
    batch = np.zeros((256, 80), np.uint8)
    for i, r in enumerate(rds):
        from real_tpu.io.reads import _MAP_TABLE
        batch[i] = _MAP_TABLE[np.frombuffer(r.seq.encode(), np.uint8)]
    quals = np.full_like(batch, 30, np.int8)
    valid = np.ones(256, bool)
    tables = score_tables(Scoring())
    return text, jnp.asarray(batch), jnp.asarray(quals), \
        jnp.asarray(valid), tables


KW = dict(seedl=32, seedkmax=2, totalkmax=5, cand_cap=32, survivor_cap=32,
          score_mode="f64")


def _single(text, codes, quals, valid, tables, scores, bsearch_steps=0):
    index = build_index(text, 32)
    st, _ = match_step(
        index.sig, index.pos, index.bb,
        text.words, text.nbits, text.ncum, text.frag_offsets,
        codes, quals, valid, initial_state(codes.shape[0]),
        jnp.int32(0), np.float32(80 * 5 / 70.0),
        tables=tables, scores=scores, matchall=False,
        bsearch_steps=bsearch_steps, **KW)
    return jax.tree.map(np.asarray, st)


def _sharded(text, codes, quals, valid, tables, scores, n_dp, n_shard,
             bsearch_steps=0):
    mesh = make_mesh(n_dp, n_shard)
    num_windows = text.n - 32 + 1
    _hi, sig, pos, bb = build_sharded_index(
        text.words, text.nbits, text.ncum, jnp.int32(text.n),
        seedl=32, num_windows=num_windows, mesh=mesh)
    st, _of = sharded_match_step(
        sig, pos, bb,
        text.words, text.nbits, text.ncum, text.frag_offsets,
        codes, quals, valid, initial_state(codes.shape[0]),
        0, np.float32(80 * 5 / 70.0),
        tables=tables, scores=scores, mesh=mesh,
        bsearch_steps=bsearch_steps, **KW)
    return jax.tree.map(np.asarray, st)


@pytest.mark.parametrize("scores", [False, True])
@pytest.mark.parametrize("n_dp,n_shard", [(1, 4), (4, 2), (8, 1), (2, 4)])
def test_sharded_equals_single(setup, scores, n_dp, n_shard):
    text, codes, quals, valid, tables = setup
    ref = _single(text, codes, quals, valid, tables, scores)
    got = _sharded(text, codes, quals, valid, tables, scores, n_dp, n_shard)
    assert (got.st == ref.st).all()
    matched = (ref.st == 1) | (ref.st == 2)
    for f in ("pos", "frag", "errs"):
        assert (getattr(got, f)[matched] == getattr(ref, f)[matched]).all()
    if scores:
        assert (got.score[matched] == ref.score[matched]).all()


@pytest.mark.parametrize("steps", [4, 8, 16])
def test_bsearch_equals_bucket_begin(setup, steps):
    """Exact equal-range begin via in-bucket binary search must give the
    same result as reading from bucket begin (both on 1 device and on a
    mesh)."""
    text, codes, quals, valid, tables = setup
    ref = _single(text, codes, quals, valid, tables, True)
    got = _single(text, codes, quals, valid, tables, True,
                  bsearch_steps=steps)
    for f in ("st", "pos", "frag", "errs", "score"):
        assert (getattr(got, f) == getattr(ref, f)).all()
    gotm = _sharded(text, codes, quals, valid, tables, True, 2, 4,
                    bsearch_steps=steps)
    assert (gotm.st == ref.st).all()


def test_ff_score_mode_matches_f64(setup):
    """The TPU two-float scoring path must produce the same f32 scores as
    the exact f64 path (same automaton outcomes) on CPU."""
    text, codes, quals, valid, tables = setup
    index = build_index(text, 32)
    kw = dict(KW)
    outs = {}
    for mode in ("f64", "ff"):
        kw["score_mode"] = mode
        st, _ = match_step(
            index.sig, index.pos, index.bb,
            text.words, text.nbits, text.ncum, text.frag_offsets,
            codes, quals, valid, initial_state(codes.shape[0]),
            jnp.int32(0), np.float32(80 * 5 / 70.0),
            tables=tables, scores=True, matchall=False, **kw)
        outs[mode] = jax.tree.map(np.asarray, st)
    a, b = outs["f64"], outs["ff"]
    assert (a.st == b.st).all()
    matched = (a.st == 1) | (a.st == 2)
    assert (a.pos[matched] == b.pos[matched]).all()
    assert np.allclose(a.score[matched], b.score[matched],
                       rtol=1e-6, atol=1e-6)
    # scores should in fact be bit-identical except at f32 rounding
    # boundaries, which should not occur on 256 reads
    assert (a.score[matched] == b.score[matched]).mean() > 0.99
