"""Index-build internals: the two bucket-table constructions must be
exactly equal (getLookupTable.hpp semantics), and the device build must
keep matching its NumPy twin at every bucket width the reads-aware
pick_bucket_bits can choose."""

import numpy as np
import jax.numpy as jnp

from real_tpu.index.build import (_rank_table_bisect, _use_bisect_table,
                                  build_index, pick_bucket_bits)
from real_tpu.index.signatures import NUM_LISTS, SigConfig
from real_tpu.text.packed import build_packed_text


def _segsum_bb(skey: np.ndarray, real_n: int, bits: int,
               shift: int) -> np.ndarray:
    """NumPy twin of the segment-sum histogram path."""
    nl, m = skey.shape
    nb = 1 << bits
    bb = np.zeros((nl, nb + 1), np.int32)
    for j in range(nl):
        h = (skey[j, :real_n] >> np.uint32(shift)).astype(np.int64)
        counts = np.bincount(h, minlength=nb)
        bb[j, 1:] = np.cumsum(counts).astype(np.int32)
    return bb


def test_rank_table_bisect_matches_histogram():
    rng = np.random.default_rng(5)
    m = 4096
    for bits, shift in ((12, 20), (8, 24), (12, 0)):
        hi = 2**32 if shift + bits == 32 else 2**(shift + bits)
        keys = np.sort(rng.integers(0, hi, (NUM_LISTS, m),
                                    dtype=np.uint32), axis=1)
        # append sentinels after the real prefix
        real_n = m - 37
        keys[:, real_n:] = np.uint32(0xFFFFFFFF)
        keys = np.sort(keys, axis=1)
        got = np.asarray(_rank_table_bisect(
            jnp.asarray(keys), jnp.int32(real_n), bits, shift))
        want = _segsum_bb(keys, real_n, bits, shift)
        assert (got == want).all(), (bits, shift)


def test_rank_table_full_width_boundary():
    """The (b << shift) == 2^32 wrap at the last boundary must count all
    real entries (the wrapping-u32 bound-1 trick)."""
    rng = np.random.default_rng(6)
    keys = np.sort(rng.integers(0, 2**32, (NUM_LISTS, 512),
                                dtype=np.uint32), axis=1)
    got = np.asarray(_rank_table_bisect(
        jnp.asarray(keys), jnp.int32(512), 12, 20))
    assert (got[:, -1] == 512).all()
    assert (got[:, 0] == 0).all()


def test_pick_bucket_bits_read_aware():
    # standard config read volumes keep the occupancy-1 width (measured:
    # matcher bisection at ~10 ns/dependent gather loses to the
    # amortized segment_sum above ~100k reads/shard)
    assert pick_bucket_bits(32, 47_000_000, reads=50_000_000) == 25
    assert pick_bucket_bits(32, 47_000_000, reads=1_000_000) == 25
    # tiny streams (overflow-rerun subsets) narrow the table
    assert pick_bucket_bits(32, 47_000_000, reads=500) < 25
    # no reads hint: old rule
    assert pick_bucket_bits(32, 47_000_000) == 25
    assert pick_bucket_bits(32, 3_000_000) == 22
    # seedl caps the width for tiny seeds regardless of reads
    assert pick_bucket_bits(8, 1 << 20, reads=10_000_000) <= 8


def test_device_build_any_bits_matches_host():
    """The device build at a narrow bucket width (bisect table) equals
    the occupancy-1 build's lists, and its table is consistent with the
    sorted lists."""
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    text = build_packed_text(codes, [("f", 0), ("terminal", len(codes))])
    seedl = 16
    a = build_index(text, seedl)                      # default width
    b = build_index(text, seedl, bucket_bits=12)      # forced narrow
    sca = SigConfig(seedl)
    m = a.sig.shape[0] // NUM_LISTS
    for j in range(NUM_LISTS):
        sa = np.asarray(a.sig[j * m:(j + 1) * m])
        sb = np.asarray(b.sig[j * m:(j + 1) * m])
        assert (np.sort(sa) == np.sort(sb)).all()
        # narrow table ranges enclose the same entries
        nbb = b.bb.shape[0] // NUM_LISTS
        bbj = np.asarray(b.bb[j * nbb:(j + 1) * nbb])
        sh = sca.bucket_shift_bits(12)
        real = sb[sb != np.uint32(0xFFFFFFFF)]
        h = np.sort(real) >> np.uint32(sh)
        want = np.searchsorted(h, np.arange(1 << 12))
        assert (bbj[:-1] == want).all()
        assert bbj[-1] == len(real)
