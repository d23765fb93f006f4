"""Algebraic structure of the best-hit merge (UpdateUniqueInfo).

The reference folds candidate hits one at a time into a per-read
UniqueMatchInfo (matchUniqueImplementation.cpp:97-160 no-scores,
:179-248 scores). Distributing that fold across index shards is legal
only when the fold is a *monoid homomorphism* — i.e. the result of
folding a concatenated hit sequence equals merging independently-folded
prefix states. This module states exactly what holds and what doesn't:

NO-SCORES MODE — associative, left-biased; commutative on disjoint loci.
  A state in {NoMatch} ∪ {Hit(pos, k, strand)} ∪ {NonUnique(k)}
  summarises any hit sequence by (k_min, witness locus+strand,
  multiplicity>1 at k_min). Merging two summaries:
    * different k_min          -> the smaller-k summary wins outright;
    * equal k_min, same locus  -> the LEFT summary's strand wins (dedup:
                                  the same locus can be reported by
                                  several probe lists and, for
                                  palindromic reads, by both strands at
                                  equal k; the reference's `diff` test
                                  keeps the first-encountered strand,
                                  matchUniqueImplementation.cpp:131-139);
    * equal k_min, diff locus  -> NonUnique(k_min);
    * NonUnique at equal k     -> NonUnique absorbs.
  This is an ASSOCIATIVE monoid with identity NoMatch whose left bias
  reproduces the sequential fold's first-strand-wins rule, so an ordered
  (shard-major) tree reduction is legal. It is NOT commutative in
  general — merge(Straight@p, Reverse@p) ≠ merge(Reverse@p, Straight@p)
  — but each genome locus lives in exactly ONE index shard (shards are
  disjoint window ranges, and both strands of a locus are probed in the
  shard that owns it), so the states being merged across shards carry
  disjoint witness loci, on which merge IS commutative. Once NonUnique,
  the witness is lost, so "same locus" can no longer be tested — same
  as the reference (NonUnique stores no position); a strictly better
  (smaller-k) hit resurrects uniqueness in both. tests/test_monoid.py
  property-tests associativity (arbitrary states), commutativity
  (disjoint loci), and merge == sequential fold over random splits,
  including the resurrection corner
  (matchUniqueImplementation.cpp:146-157).

SCORES MODE — NOT associative (order matters inside the epsilon window).
  `better = s_new > s_old + eps`, `tie = !better && s_new > s_old - eps`:
  a chain of hits each within eps of the previous can drift so that the
  outcome depends on encounter order (s1=0, s2=eps*0.9, s3=eps*1.8: the
  order (s1,s2,s3) yields NonUnique at s2 then better-resurrection at s3;
  (s1,s3,s2) yields Hit(s3) then tie with s2 -> NonUnique). The reference
  is therefore order-DEFINED, not order-free: probes run list 0..5
  straight then reverse, candidates in ascending sorted-list order, text
  blocks in ascending position order (matchUniqueImplementation.cpp:
  416-488, :1253). Cross-shard merging in scores mode must replay that
  order — our mesh path all-gathers survivors over the shard axis and
  folds them shard-major (parallel/mesh.py:sharded_match_step), which IS
  block-major reference order. test_monoid.py carries a concrete
  non-associativity witness so nobody "optimises" this into a psum.

Both modes ARE homomorphic under ordered concatenation: fold(xs ++ ys) ==
fold_from(fold(xs), ys). That (much weaker) property is what the
sequential shard loop and the ordered gather-fold rely on; it holds by
construction (the fold never looks back at consumed hits) and is also
property-tested.

EARLY-EXIT LEMMA. The reference skips straight lists 1..5 when list 0
left state == Straight with 0 errors (and likewise reverse lists 1..5
after list-0-reverse; matchUniqueImplementation.cpp:434-436,470-472,
scores mode never skips). This is a pure optimisation, not a semantic
difference, so our fold over ALL 12 probes' candidates is observably
equal: a skipped candidate could only change a 0-error unique state via
`take` (needs k < 0 — impossible) or `tie` (needs k == 0 — an exact
whole-window duplicate, which shares *all six* pair signatures and
therefore already appeared in list 0's equal range of the SAME strand,
where it was processed). List 0 of both strands always runs, so exact
reverse (palindromic) duplicates are seen too.
"""

from __future__ import annotations

import dataclasses

NO_MATCH, STRAIGHT, REVERSE, GAPPED, NON_UNIQUE = 0, 1, 2, 3, 4


@dataclasses.dataclass(frozen=True)
class State:
    """Host-side mirror of one read's MatchState row (engine/matchstep.py)."""
    st: int = NO_MATCH
    pos: int = 0
    frag: int = 0
    fileid: int = 0
    errs: int = 0


@dataclasses.dataclass(frozen=True)
class Hit:
    pos: int
    frag: int
    fileid: int
    k: int
    inv: bool = False


def fold_hit(s: State, h: Hit) -> State:
    """Reference no-scores automaton, one step
    (matchUniqueImplementation.cpp:97-160). Mirrors
    matchstep.fold_unique with scores=False."""
    is_open = s.st in (NO_MATCH, GAPPED)
    is_hit = s.st in (STRAIGHT, REVERSE)
    is_nu = s.st == NON_UNIQUE
    diff = (h.pos != s.pos or h.frag != s.frag or h.fileid != s.fileid)
    better = h.k < s.errs
    take = is_open or ((is_hit or is_nu) and better)
    tie = is_hit and h.k == s.errs and diff
    if take:
        return State(REVERSE if h.inv else STRAIGHT,
                     h.pos, h.frag, h.fileid, h.k)
    if tie:
        return State(NON_UNIQUE, s.pos, s.frag, s.fileid, s.errs)
    return State(s.st, s.pos, s.frag, s.fileid, s.errs)


def fold_hits(s: State, hits) -> State:
    for h in hits:
        s = fold_hit(s, h)
    return s


@dataclasses.dataclass(frozen=True)
class ScoreState(State):
    score: float = -3.4028234663852886e38   # -FLT_MAX (UniqueMatchInfo.hpp:191)


@dataclasses.dataclass(frozen=True)
class ScoreHit(Hit):
    score: float = 0.0


def fold_hit_scores(s: ScoreState, h: ScoreHit, eps: float) -> ScoreState:
    """Reference scores automaton, one step
    (matchUniqueImplementation.cpp:179-248). Mirrors
    matchstep.fold_unique with scores=True."""
    is_open = s.st in (NO_MATCH, GAPPED)
    is_hit = s.st in (STRAIGHT, REVERSE)
    is_nu = s.st == NON_UNIQUE
    diff = (h.pos != s.pos or h.frag != s.frag or h.fileid != s.fileid)
    better = h.score > s.score + eps
    within = h.score > s.score - eps
    take = is_open or ((is_hit or is_nu) and better)
    tie = is_hit and not better and within and diff
    if take:
        return ScoreState(REVERSE if h.inv else STRAIGHT,
                          h.pos, h.frag, h.fileid, h.k, h.score)
    if tie:
        return ScoreState(NON_UNIQUE, s.pos, s.frag, s.fileid, s.errs,
                          s.score)
    return s


def observable(s: State):
    """What the output pass can see: unique states print (pos, frag,
    fileid, errs[, score]); NonUnique/NoMatch print nothing."""
    if s.st in (STRAIGHT, REVERSE):
        return (s.st, s.pos, s.frag, s.fileid, s.errs,
                getattr(s, "score", None))
    return (s.st,)


def merge_states(a: State, b: State) -> State:
    """Associative commutative merge of two independently-folded no-scores
    states (the cross-shard all-reduce operator). Identity: NoMatch."""
    a_open = a.st in (NO_MATCH, GAPPED)
    b_open = b.st in (NO_MATCH, GAPPED)
    if b_open:
        return a
    if a_open:
        return b
    # both carry hits (unique or non-unique)
    if a.errs != b.errs:
        return a if a.errs < b.errs else b
    # equal error count
    a_hit = a.st in (STRAIGHT, REVERSE)
    b_hit = b.st in (STRAIGHT, REVERSE)
    if a_hit and b_hit:
        same = (a.pos == b.pos and a.frag == b.frag
                and a.fileid == b.fileid)
        if same:
            return a
        return State(NON_UNIQUE, a.pos, a.frag, a.fileid, a.errs)
    # at least one NonUnique at the same (minimal) k absorbs
    nu = a if not a_hit else b
    return State(NON_UNIQUE, nu.pos, nu.frag, nu.fileid, nu.errs)
