"""Parity tests: native C++ host kernels vs the pure-numpy reference paths."""

import numpy as np
import pytest

from flashfry_tpu import native
from flashfry_tpu.bitcoding import _BASE_LUT, codes_to_longs
from flashfry_tpu.discovery import (_extract_windows, _pam_window_patterns,
                                    _scan_codes_numpy)
from flashfry_tpu.standards import (Cas9NGGParameterPack, Cas9ParameterPack,
                                    Cpf1ParameterPack)

pytestmark = pytest.mark.skipif(native.get_native() is None,
                                reason="native library unavailable")


def random_codes(n, seed, n_frac=0.01):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    bad = rng.random(n) < n_frac
    codes[bad] = 255
    return codes


@pytest.mark.parametrize("pack", [Cas9ParameterPack, Cas9NGGParameterPack,
                                  Cpf1ParameterPack])
@pytest.mark.parametrize("strand", ["fwd", "rev"])
def test_scan_sites_matches_numpy(pack, strand):
    fwd_pats, rev_pats = _pam_window_patterns(pack)
    pats = fwd_pats if strand == "fwd" else rev_pats
    L = pack.total_scan_length
    codes = random_codes(200_000, seed=hash((pack.name, strand)) % 2**31)
    want = _scan_codes_numpy(codes, pats, L)
    got = native.scan_sites(codes, pats, L)
    np.testing.assert_array_equal(got, want)


def test_scan_sites_short_and_empty():
    pats = ["NNGG"]
    assert native.scan_sites(np.zeros(2, dtype=np.uint8), pats, 4).size == 0
    got = native.scan_sites(np.array([2, 2, 2, 2], dtype=np.uint8), pats, 4)
    np.testing.assert_array_equal(got, [0])


def test_pack_windows_matches_numpy():
    codes = random_codes(50_000, seed=7, n_frac=0.0)
    L = 23
    starts = np.arange(0, codes.size - L, 37, dtype=np.int64)
    for rc in (False, True):
        windows = _extract_windows(codes, starts, L)
        if rc:
            windows = (3 - windows)[:, ::-1]
        want = codes_to_longs(windows)
        got = native.pack_windows(codes, starts, L, reverse_complement=rc)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pack", [Cas9NGGParameterPack, Cpf1ParameterPack])
def test_build_index_matches_numpy(pack, monkeypatch):
    from flashfry_tpu import database as db_mod
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.utils import reverse_comp_string  # noqa: F401

    rng = np.random.default_rng(11)
    # small genome with enough repeats to exercise dedup + count merging
    chunk = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, 20_000)]).decode()
    seq = chunk + chunk[5_000:15_000] + chunk  # duplicated content
    sites = find_target_sites(iter([("c1", seq), ("c2", chunk[::-1])]), pack)

    got = db_mod.build_database_from_sites(sites, bin_width=5,
                                           max_positions_per_target=3)
    monkeypatch.setattr(db_mod.native, "build_index", lambda *a, **k: None)
    want = db_mod.build_database_from_sites(sites, bin_width=5,
                                            max_positions_per_target=3)
    np.testing.assert_array_equal(got.targets, want.targets)
    np.testing.assert_array_equal(got.positions, want.positions)
    np.testing.assert_array_equal(got.pos_offsets, want.pos_offsets)
    np.testing.assert_array_equal(got.bin_start, want.bin_start)


def test_group_sorted():
    vals = np.sort(np.random.default_rng(3).integers(0, 500, size=10_000)).astype(np.uint64)
    uniq, counts = native.group_sorted(vals)
    want_uniq, want_counts = np.unique(vals, return_counts=True)
    np.testing.assert_array_equal(uniq, want_uniq)
    np.testing.assert_array_equal(counts, want_counts)
    u0, c0 = native.group_sorted(np.zeros(0, dtype=np.uint64))
    assert u0.size == 0 and c0.size == 0


def test_segment_fold_native_matches_python():
    """ff_segment_fold_f64 must be BIT-identical to the Python left fold —
    the score columns' byte parity rides on it."""
    import numpy as np
    from flashfry_tpu import native
    from flashfry_tpu.scoring import base

    if native.get_native() is None:
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(9)
    n = 50_000
    # mix magnitudes so naive-vs-compensated summation would differ
    vals = np.exp(rng.normal(0, 6, size=n))
    weights = vals * rng.integers(1, 5, size=n)
    mask = (rng.random(n) < 0.7).astype(np.uint8)
    cuts = np.sort(rng.choice(n, size=999, replace=False))
    offsets = np.concatenate([[0], cuts, [n]]).astype(np.int64)

    ns, nm, na = native.segment_fold(vals, weights, mask, offsets)
    # force the Python fallback through the same helper
    orig = native.segment_fold
    try:
        native.segment_fold = lambda *a: None
        ps, pm, pa = base.segment_fold(vals, weights, mask, offsets)
    finally:
        native.segment_fold = orig
    assert ns.tobytes() == ps.tobytes()
    assert nm.tobytes() == pm.tobytes()
    assert (na == pa).all()


def test_fold_sum_is_scala_left_fold_not_builtin_sum():
    """CPython >= 3.12 builtins.sum compensates float error (Neumaier); the
    reference's Scala List.sum is a naive foldLeft. fold_sum must match the
    fold, and this input is a witness where the two differ."""
    from flashfry_tpu.scoring.base import fold_sum
    vals = [2.0, 0.004227855778759992, 0.04425669742768371]
    acc = 0.0
    for v in vals:
        acc += v
    assert fold_sum(vals) == acc
    big = [1e16, 1.0, -1e16, 1.0] * 10
    acc = 0.0
    for v in big:
        acc += v
    assert fold_sum(big) == acc
    assert sum(big) != acc  # builtins.sum compensates; the JVM does not
