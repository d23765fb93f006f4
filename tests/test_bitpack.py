import numpy as np

from real_tpu import bitpack


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 15, 16, 17, 100, 1000]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        words = bitpack.pack_2bit(codes)
        assert bitpack.unpack_2bit(words, n).tolist() == codes.tolist()


def test_pack_msb_first():
    # base 0 in the two most significant bits
    words = bitpack.pack_2bit(np.array([3], dtype=np.uint8))
    assert words[0] == 0xC0000000


def test_bitmap_and_cum():
    rng = np.random.default_rng(1)
    bits = rng.random(1000) < 0.1
    words = bitpack.pack_bitmap(bits)
    ncum = bitpack.bitmap_cum_popcount(words)
    assert ncum[-1] == bits.sum()
    # spot-check rank at word boundaries
    for j in range(0, 31):
        assert ncum[j + 1] - ncum[j] == bits[32 * j:32 * (j + 1)].sum()


def test_pack_rows():
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 4, (7, 37)).astype(np.uint8)
    words = bitpack.pack_rows_2bit(rows)
    assert words.shape == (7, 3)
    for i in range(7):
        single = bitpack.pack_2bit(rows[i], pad_words=0)
        assert (words[i] == single).all()
