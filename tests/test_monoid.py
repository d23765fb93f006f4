"""Property tests for the best-hit merge algebra (engine/monoid.py).

SURVEY §7 "hard parts" demands dedicated property tests for this monoid
before distributing it: the no-scores fold must be order-free (so a
cross-shard all-reduce is legal) and the scores fold is order-DEFINED
(so the mesh path must replay reference merge order). Both directions
are pinned here, plus the equivalence of the host monoid with the
device automaton (matchstep.fold_unique).
"""

import itertools
import random

import numpy as np
import pytest

from real_tpu.engine import monoid
from real_tpu.engine.monoid import (Hit, NO_MATCH, NON_UNIQUE, REVERSE,
                                    STRAIGHT, ScoreHit, ScoreState, State,
                                    fold_hit, fold_hit_scores, fold_hits,
                                    merge_states, observable)


def random_hits(rng, n, npos=4, kmax=4, pos_base=0):
    """Random hits; pos_base offsets the locus universe (disjoint shards)."""
    return [Hit(pos=pos_base + rng.randrange(npos), frag=rng.randrange(2),
                fileid=rng.randrange(2), k=rng.randrange(kmax),
                inv=bool(rng.randrange(2)))
            for _ in range(n)]


def test_merge_identity():
    rng = random.Random(0)
    for hits in (random_hits(rng, n) for n in range(6)):
        s = fold_hits(State(), hits)
        assert observable(merge_states(s, State())) == observable(s)
        assert observable(merge_states(State(), s)) == observable(s)


def test_merge_associative():
    """merge is associative on arbitrary folded states (observable
    projection: NonUnique keeps no witness position, like the reference's
    UniqueMatchInfo) — this is what makes an ordered tree-reduce legal."""
    rng = random.Random(1)
    for _ in range(3000):
        a = fold_hits(State(), random_hits(rng, rng.randrange(5)))
        b = fold_hits(State(), random_hits(rng, rng.randrange(5)))
        c = fold_hits(State(), random_hits(rng, rng.randrange(5)))
        assert observable(merge_states(merge_states(a, b), c)) == \
            observable(merge_states(a, merge_states(b, c)))


def test_merge_commutative_on_disjoint_loci():
    """merge is commutative when the two states' witness loci come from
    disjoint position universes — true across index shards (each genome
    locus belongs to exactly one shard). NOT true in general: at the same
    locus with both strands at equal k, the left (earlier-probed) strand
    wins, matching the sequential fold's first-strand-wins rule."""
    rng = random.Random(5)
    for _ in range(3000):
        a = fold_hits(State(), random_hits(rng, rng.randrange(5)))
        b = fold_hits(State(), random_hits(rng, rng.randrange(5),
                                           pos_base=100))
        assert observable(merge_states(a, b)) == \
            observable(merge_states(b, a))
    # the non-commutative same-locus witness:
    a = fold_hits(State(), [Hit(1, 0, 0, 1, inv=False)])
    b = fold_hits(State(), [Hit(1, 0, 0, 1, inv=True)])
    assert merge_states(a, b).st == STRAIGHT
    assert merge_states(b, a).st == REVERSE


def test_merge_equals_sequential_fold():
    """The all-reduce law: merging independently folded shards equals the
    reference's sequential fold over the concatenated hit stream —
    including the NonUnique 'resurrection' corner
    (matchUniqueImplementation.cpp:146-157)."""
    rng = random.Random(2)
    for _ in range(3000):
        xs = random_hits(rng, rng.randrange(6))
        ys = random_hits(rng, rng.randrange(6))
        seq = fold_hits(State(), xs + ys)
        par = merge_states(fold_hits(State(), xs), fold_hits(State(), ys))
        assert observable(seq) == observable(par), (xs, ys)


def test_merge_resurrection_corner():
    """NonUnique + strictly better hit resurrects uniqueness."""
    xs = [Hit(1, 0, 0, 2), Hit(2, 0, 0, 2)]          # -> NonUnique(2)
    ys = [Hit(3, 0, 0, 1)]                            # better
    seq = fold_hits(State(), xs + ys)
    assert seq.st == STRAIGHT and seq.errs == 1 and seq.pos == 3
    par = merge_states(fold_hits(State(), xs), fold_hits(State(), ys))
    assert observable(par) == observable(seq)


def test_fold_concat_homomorphism_scores():
    """Ordered-concatenation homomorphism (what the sequential shard loop
    and the ordered shard-major gather-fold rely on): holds for BOTH
    modes by construction."""
    rng = random.Random(3)
    eps = 0.5
    for _ in range(1000):
        xs = [ScoreHit(pos=rng.randrange(4), frag=0, fileid=0,
                       k=rng.randrange(4), inv=False,
                       score=rng.choice([0.0, 0.3, 0.6, 0.9, 1.2]))
              for _ in range(rng.randrange(6))]
        cut = rng.randrange(len(xs) + 1)
        full = ScoreState()
        for h in xs:
            full = fold_hit_scores(full, h, eps)
        part = ScoreState()
        for h in xs[:cut]:
            part = fold_hit_scores(part, h, eps)
        for h in xs[cut:]:
            part = fold_hit_scores(part, h, eps)
        assert observable(full) == observable(part)


def test_scores_mode_not_commutative():
    """Concrete witness that the scores fold is order-sensitive inside the
    epsilon window — merging scores-mode states with an unordered
    all-reduce would be WRONG; the mesh path must (and does) fold in
    shard-major reference order (parallel/mesh.py)."""
    eps = 1.0
    h1 = ScoreHit(pos=1, frag=0, fileid=0, k=1, inv=False, score=0.0)
    h2 = ScoreHit(pos=2, frag=0, fileid=0, k=1, inv=False, score=0.9)
    h3 = ScoreHit(pos=3, frag=0, fileid=0, k=1, inv=False, score=1.8)

    def fold(hits):
        s = ScoreState()
        for h in hits:
            s = fold_hit_scores(s, h, eps)
        return s

    a = fold([h1, h2, h3])   # 0 -> tie(0.9) NonUnique -> 1.8 resurrects
    b = fold([h1, h3, h2])   # 0 -> 1.8 better -> 0.9 within eps: NonUnique
    assert a.st in (STRAIGHT, REVERSE)
    assert b.st == NON_UNIQUE
    assert observable(a) != observable(b)


def test_host_monoid_matches_device_automaton():
    """fold_hit (host mirror) == matchstep.fold_unique (device), both
    modes, over random survivor sets."""
    import jax.numpy as jnp

    from real_tpu.engine.matchstep import Survivors, fold_unique, \
        initial_state

    rng = np.random.default_rng(4)
    B, S = 64, 5
    valid = rng.random((B, S)) < 0.6
    inv = rng.random((B, S)) < 0.5
    pos = rng.integers(0, 4, (B, S)).astype(np.int32)
    frag = rng.integers(0, 2, (B, S)).astype(np.int32)
    k = rng.integers(0, 4, (B, S)).astype(np.int32)
    score = rng.choice(np.array([0.0, 0.3, 0.6, 0.9, 1.2], np.float32),
                       (B, S))
    eps = np.float32(0.5)

    for scores in (False, True):
        surv = Survivors(valid=jnp.asarray(valid), inv=jnp.asarray(inv),
                         pos=jnp.asarray(pos), frag=jnp.asarray(frag),
                         k=jnp.asarray(k), score=jnp.asarray(score),
                         overflow=jnp.zeros(B, bool))
        out = fold_unique(initial_state(B), surv, 0, eps, scores=scores)
        for b in range(B):
            if scores:
                st = ScoreState()
                for s in range(S):
                    if valid[b, s]:
                        st = fold_hit_scores(
                            st, ScoreHit(int(pos[b, s]), int(frag[b, s]), 0,
                                         int(k[b, s]), bool(inv[b, s]),
                                         float(score[b, s])), float(eps))
            else:
                st = State()
                for s in range(S):
                    if valid[b, s]:
                        st = fold_hit(
                            st, Hit(int(pos[b, s]), int(frag[b, s]), 0,
                                    int(k[b, s]), bool(inv[b, s])))
            assert int(out.st[b]) == st.st, (b, scores)
            if st.st in (STRAIGHT, REVERSE):
                assert int(out.pos[b]) == st.pos
                assert int(out.errs[b]) == st.errs
                if scores:
                    assert np.isclose(float(out.score[b]), st.score)
