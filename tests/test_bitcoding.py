"""Encoding round-trip + mismatch tests.

Ports the reference's BitEncodingTest.scala cases (values hard-coded there)
onto the vectorized numpy implementation.
"""

import numpy as np
import pytest

from flashfry_tpu.bitcoding import (BitEncoding, STRING_MASK, all_bins,
                                    bin_index_to_string, popcount64)
from flashfry_tpu.standards import (Cas9NGGParameterPack, Cas9ParameterPack,
                                    Cpf1ParameterPack)


def s(x):
    return x.replace(" ", "")


def test_encode_decode_roundtrip_simple():
    # BitEncodingTest.scala:20-29
    enc = BitEncoding(Cas9ParameterPack)
    e = enc.encode(s("AAAAA CCCCC GGGGG TTTTA GGG"), 1000)
    seq, count = enc.decode(e)
    assert seq == s("AAAAA CCCCC GGGGG TTTTA GGG")
    assert count == 1000


def test_encode_decode_random_roundtrip():
    # BitEncodingTest.scala:53-64 (100k randomized round-trips)
    rng = np.random.default_rng(42)
    enc = BitEncoding(Cas9ParameterPack)
    n = 100000
    codes = rng.integers(0, 4, size=(n, 23))
    seqs = ["".join("ACGT"[c] for c in row) for row in codes]
    counts = rng.integers(1, 32767, size=n)
    encs = enc.encode_batch(seqs, counts)
    dec_seqs, dec_counts = enc.decode_batch(encs)
    assert dec_seqs == seqs
    assert (dec_counts == counts).all()


def test_identical_strings_no_mismatch():
    # BitEncodingTest.scala:79-99
    enc = BitEncoding(Cas9ParameterPack)
    e1 = enc.encode(s("AAAAA CCCCC GGGGG TTTTA GGG"), 1000)
    e2 = enc.encode(s("AAAAA CCCCC GGGGG TTTTA GGG"), 1001)
    assert enc.mismatches(e1, e1) == 0
    assert enc.mismatches(e1, e2) == 0


def test_one_base_difference():
    # BitEncodingTest.scala:101-112
    enc = BitEncoding(Cas9ParameterPack)
    e1 = enc.encode(s("AAAAA CCCCC GGGGG TTTTA GGG"), 1000)
    e2 = enc.encode(s("TAAAA CCCCC GGGGG TTTTA GGG"), 1001)
    assert enc.mismatches(e1, e2) == 1


def test_all_compared_bases_differ():
    # BitEncodingTest.scala:114-125 — PAM excluded, so 20 not 23
    enc = BitEncoding(Cas9ParameterPack)
    e1 = enc.encode(s("AAAAA CCCCC GGGGG TTTTA GGG"), 1000)
    e2 = enc.encode(s("TTTTT TTTTT AAAAA GGGGG GGG"), 1001)
    assert enc.mismatches(e1, e2) == 20


def test_pam_degenerate_bases_not_counted():
    # BitEncodingTest.scala:127-151
    enc = BitEncoding(Cas9ParameterPack)
    e1 = enc.encode(s("AAAAA CCCCC GGGGG AAAAT AGG"), 1000)
    e2 = enc.encode(s("AAAAA CCCCC GGGGG TTTTA GGG"), 1001)
    assert enc.mismatches(e1, e2) == 5
    e3 = enc.encode(s("AAAAA CCCCC GGGGG AAAAT AAG"), 1000)
    assert enc.mismatches(e3, e2) == 5


def test_randomized_mismatch_counts_cas9():
    # BitEncodingTest.scala:153-167 — guide region is bases [0, 20)
    rng = np.random.default_rng(7)
    enc = BitEncoding(Cas9ParameterPack)
    n = 10000
    c1 = rng.integers(0, 4, size=(n, 23))
    c2 = rng.integers(0, 4, size=(n, 23))
    s1 = ["".join("ACGT"[c] for c in row) for row in c1]
    s2 = ["".join("ACGT"[c] for c in row) for row in c2]
    e1 = enc.encode_batch(s1)
    e2 = enc.encode_batch(s2)
    got = enc.mismatches(e1, e2)
    expect = (c1[:, :20] != c2[:, :20]).sum(axis=1)
    assert (got == expect).all()


def test_randomized_mismatch_counts_cpf1():
    # BitEncodingTest.scala:186-200 — cpf1 compares bases [4, 24)
    rng = np.random.default_rng(8)
    enc = BitEncoding(Cpf1ParameterPack)
    n = 10000
    c1 = rng.integers(0, 4, size=(n, 24))
    c2 = rng.integers(0, 4, size=(n, 24))
    s1 = ["".join("ACGT"[c] for c in row) for row in c1]
    s2 = ["".join("ACGT"[c] for c in row) for row in c2]
    e1 = enc.encode_batch(s1)
    e2 = enc.encode_batch(s2)
    got = enc.mismatches(e1, e2)
    expect = (c1[:, 4:] != c2[:, 4:]).sum(axis=1)
    assert (got == expect).all()


def test_bin_perfect_match():
    # BitEncodingTest.scala:236-250
    enc = BitEncoding(Cas9ParameterPack)
    e = enc.encode(s("AAAAA CCCCC GGGGG TTTTA GGG"), 1)
    bam = enc.bin_to_long_comparator("AAAAA")
    assert enc.mismatch_bin(bam, e) == 0


def test_bin_two_mismatches():
    # BitEncodingTest.scala:252-264
    enc = BitEncoding(Cas9ParameterPack)
    e = enc.encode(s("TTAAT CCCCC GGGGG TTTTA GGG"), 1)
    bam = enc.bin_to_long_comparator("TTTTT")
    assert enc.mismatch_bin(bam, e) == 2


def test_bin_nine_wide_perfect():
    # BitEncodingTest.scala:266-278
    enc = BitEncoding(Cas9ParameterPack)
    e = enc.encode(s("AAAAA AAAAC GGGGG TTTTA GGG"), 1)
    assert enc.mismatch_bin(enc.bin_to_long_comparator("AAAAAAAAA"), e) == 0


def test_bin_mismatch_ngg():
    # BitEncodingTest.scala:310-319, 338-359
    enc = BitEncoding(Cas9NGGParameterPack)
    e = enc.encode(s("GAGTC CGAGC AGAAG AAGAA GGG"), 1)
    assert enc.mismatch_bin(enc.bin_to_long_comparator("GAGTCCG"), e) == 0
    e2 = enc.encode(s("GGCTC CGAGC AGAAG AAGAA GGG"), 1)
    assert enc.mismatch_bin(enc.bin_to_long_comparator("GAGTCCG"), e2) == 2
    assert enc.mismatch_bin(enc.bin_to_long_comparator("AAAAAAA"), e2) == 7


def test_bin_mismatch_cpf1_five_prime():
    # BitEncodingTest.scala:321-336 — bin sits after the 5' PAM
    enc = BitEncoding(Cpf1ParameterPack)
    e = enc.encode(s("TTTT CGAGC AGAAG AAGAA GGGAC"), 1)
    assert enc.mismatch_bin(enc.bin_to_long_comparator("CGAGCAG"), e) == 0
    assert enc.mismatch_bin(enc.bin_to_long_comparator("CAAGCAG"), e) == 1
    assert enc.mismatch_bin(enc.bin_to_long_comparator("AGAGCAA"), e) == 2


def test_guide_distance_emx1():
    # BitEncodingTest.scala:296-307
    enc = BitEncoding(Cas9NGGParameterPack)
    e1 = enc.encode(s("GAGTC CGAGC AGAAG AAGAA GGG"), 1)
    e2 = enc.encode(s("GAATC ATAGC AGAAG ATGAA AGG"), 1001)
    assert enc.mismatches(e1, e2) == 4


def test_update_and_get_count():
    enc = BitEncoding(Cas9ParameterPack)
    e = enc.encode_batch([s("AAAAA CCCCC GGGGG TTTTA GGG")], 5)
    assert BitEncoding.get_count(e)[0] == 5
    e2 = BitEncoding.update_count(e, 77)
    assert BitEncoding.get_count(e2)[0] == 77
    seq, _ = enc.decode(int(e2[0]))
    assert seq == s("AAAAA CCCCC GGGGG TTTTA GGG")


def test_mismatches_cross_matrix():
    enc = BitEncoding(Cas9NGGParameterPack)
    guides = enc.encode_batch([s("GAGTC CGAGC AGAAG AAGAA GGG"),
                               s("AAAAA CCCCC GGGGG TTTTA GGG")])
    targets = enc.encode_batch([s("GAGTC CGAGC AGAAG AAGAA GGG"),
                                s("GAATC ATAGC AGAAG ATGAA AGG"),
                                s("TTTTT TTTTT AAAAA GGGGG GGG")])
    mm = enc.mismatches_cross(guides, targets)
    assert mm.shape == (2, 3)
    assert mm[0, 0] == 0
    assert mm[0, 1] == 4
    assert mm[1, 2] == 20


def test_popcount64():
    xs = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 0x8000000000000000], dtype=np.uint64)
    assert popcount64(xs).tolist() == [0, 1, 2, 64, 1]


def test_bin_enumeration_matches_reference_order():
    # BaseCombinationGenerator order: AA, AC, AG, AT, CA, ...
    bins = all_bins(2)
    assert bins[:5] == ["AA", "AC", "AG", "AT", "CA"]
    assert bins[-1] == "TT"
    assert len(bins) == 16
    assert bin_index_to_string(0, 3) == "AAA"


def test_bin_index_of_targets_cas9_and_cpf1():
    enc9 = BitEncoding(Cas9NGGParameterPack)
    e = enc9.encode_batch([s("GAGTC CGAGC AGAAG AAGAA GGG")])
    idx = enc9.bin_index_of_targets(e, 7)
    assert bin_index_to_string(int(idx[0]), 7) == "GAGTCCG"

    enc1 = BitEncoding(Cpf1ParameterPack)
    e = enc1.encode_batch([s("TTTT CGAGC AGAAG AAGAA GGGAC")])
    idx = enc1.bin_index_of_targets(e, 7)
    assert bin_index_to_string(int(idx[0]), 7) == "CGAGCAG"


def test_rejects_bad_characters():
    enc = BitEncoding(Cas9ParameterPack)
    with pytest.raises(ValueError):
        enc.encode_batch(["N" * 23])


def test_rejects_too_long():
    enc = BitEncoding(Cas9ParameterPack)
    with pytest.raises(ValueError):
        enc.encode_batch(["A" * 25])


def test_mismatches_native_and_numpy_paths_agree():
    """mismatches() routes through the native popcount kernel for large
    equal-shape pairs (uint8 result) and the numpy SWAR chain otherwise
    (int64 result). Both paths must agree VALUE-wise, and both dtypes must
    survive the arithmetic callers actually perform (ADVICE r4: the dual
    dtype is deliberate — one uint8 output allocation vs ~9 int64
    temporaries at 18M pairs — but must stay semantically equivalent)."""
    from flashfry_tpu.standards import Cas9NGGParameterPack

    enc = BitEncoding(Cas9NGGParameterPack)
    rng = np.random.default_rng(5)
    n = (1 << 16) + 512  # just over the native-path threshold
    a = (rng.integers(0, 1 << 48, size=n, dtype=np.uint64)
         | (np.uint64(1) << np.uint64(48)))
    b = (rng.integers(0, 1 << 48, size=n, dtype=np.uint64)
         | (np.uint64(1) << np.uint64(48)))

    large = enc.mismatches(a, b)                      # native path if built
    small = enc.mismatches(a[:1024], b[:1024])        # numpy path always
    assert np.issubdtype(large.dtype, np.integer)
    assert small.dtype == np.int64
    assert np.array_equal(large[:1024].astype(np.int64), small)

    # caller-style arithmetic must not wrap on either dtype: the bincount
    # key ClosestHit builds (gi * (K+1) + mm) promotes through int64
    gi = rng.integers(0, 1000, size=n, dtype=np.int64)
    key_large = gi * 5 + np.minimum(large.astype(np.int64), 4)
    key_small = gi[:1024] * 5 + np.minimum(small, 4)
    assert key_large.dtype == np.int64
    assert np.array_equal(key_large[:1024], key_small)
