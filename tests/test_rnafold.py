"""`folding` metric tests, ported from the reference's RNAFold4jTest.scala,
plus an exhaustive structure-enumeration oracle for the Zuker DP."""

import itertools

import numpy as np
import pytest

import flashfry_tpu.scoring.rnafold as rf
from flashfry_tpu.scoring.rnafold import RNAFold4j, fold_mfe, fold_mfe_batch
from flashfry_tpu.standards import Cas9ParameterPack, Cpf1ParameterPack


def test_golden_mfes():
    # RNAFold4jTest.scala:24-29 — values from rnafold4j / ViennaRNA 1.8.5
    assert fold_mfe("AGTACTCGAGTACTTCC") == pytest.approx(-3.5, abs=1e-3)
    assert fold_mfe("AAGTACTCGAGTACTTCC") == pytest.approx(-4.4, abs=1e-3)
    assert fold_mfe("GGAAGTACTCGAGTACTTCC") == pytest.approx(-10.5, abs=1e-3)
    assert fold_mfe("GCCAGGAAGTACTCGAGTACTTCC") == pytest.approx(-10.7, abs=1e-3)


def test_unstructured_and_short():
    assert fold_mfe("AAAAAAAAAAAAAAAAAAAA") == 0.0   # no pairs possible
    assert fold_mfe("ACGU") == 0.0                   # below min hairpin span
    assert fold_mfe("") == 0.0


def test_rna_dna_equivalence():
    assert fold_mfe("GGAAGUACUCGAGUACUUCC") == fold_mfe("GGAAGTACTCGAGTACTTCC")


def test_gc_hairpin_is_stable():
    # strong GC stem with a stable UUCG tetraloop must fold well below zero
    assert fold_mfe("GGGGCUUCGGCCCC") < -5.0


# ---------------------------------------------------------------------------
# exhaustive enumeration oracle
#
# The DP (fold_mfe) is verified against a brute-force minimum over EVERY
# nested secondary structure, with loop energies evaluated directly from the
# structure (independent of the DP recursions — in particular the dangles=1
# base-assignment logic, the multiloop decomposition and the exterior loop
# are all re-derived here from the loop decomposition of a fixed structure).
# ---------------------------------------------------------------------------


def _enum_structures(s, lo, hi, memo):
    """All nested structures of 1-based positions [lo, hi]: tuples of (i, j)
    pairs, min hairpin 3 (pair span >= 4), only pairable bases."""
    if hi - lo < 4:
        return [()]
    key = (lo, hi)
    if key in memo:
        return memo[key]
    out = list(_enum_structures(s, lo + 1, hi, memo))  # lo unpaired
    for k in range(lo + 4, hi + 1):
        if rf._PAIR.get((s[lo], s[k]), 0):
            for inner in _enum_structures(s, lo + 1, k - 1, memo):
                for rest in _enum_structures(s, k + 1, hi, memo):
                    out.append(((lo, k),) + inner + rest)
    memo[key] = out
    return out


def _best_dangle_assignment(ends, unpaired, n):
    """Minimal dangles=1 contribution for one loop: each helix end may claim
    its 5'/3' adjacent base (or both), bases must exist, be unpaired in this
    loop, and no base serves two ends."""
    best = [0]

    def rec(k, used, acc):
        if k == len(ends):
            best[0] = min(best[0], acc)
            return
        (pa, ea), (pb, eb) = ends[k]
        ok_a = pa is not None and 1 <= pa <= n and pa in unpaired and pa not in used
        ok_b = pb is not None and 1 <= pb <= n and pb in unpaired and pb not in used
        rec(k + 1, used, acc)
        if ok_a:
            rec(k + 1, used | {pa}, acc + ea)
        if ok_b:
            rec(k + 1, used | {pb}, acc + eb)
        if ok_a and ok_b and pa != pb:
            rec(k + 1, used | {pa, pb}, acc + ea + eb)

    rec(0, set(), 0)
    return best[0]


def _eval_structure(rna, s, pairs, dangles):
    """Energy (10 cal/mol) of one fixed structure under the fold_mfe model."""
    n = len(rna)
    tabs = rf._load_int_tables()
    ptype = {(i, j): rf._PAIR[(s[i], s[j])] for i, j in pairs}
    paired = {p for ij in pairs for p in ij}

    # parent of each pair = innermost enclosing pair
    parent = {}
    for (i, j) in pairs:
        enclosing = [(a, b) for (a, b) in pairs if a < i and j < b]
        parent[(i, j)] = (max(a for a, _ in enclosing),
                          min(b for _, b in enclosing)) if enclosing else None
    kids = {ij: [] for ij in pairs}
    ext = []
    for ij in sorted(pairs):
        (kids[parent[ij]] if parent[ij] else ext).append(ij)

    e = 0
    for (i, j) in pairs:
        t = ptype[(i, j)]
        cs = kids[(i, j)]
        if not cs:
            e += rf._hairpin_energy(i, j, t, s, rna)
        elif len(cs) == 1:
            (p, q), = cs
            e += rf._loop_energy(p - i - 1, j - q - 1, t,
                                 rf._RTYPE[ptype[(p, q)]],
                                 s[i + 1], s[j - 1], s[p - 1], s[q + 1], tabs)
            e += 0  # child's own loops added in its own iteration
        else:  # multiloop
            tt = rf._RTYPE[t]
            e += rf._ML_CLOSING + rf._ML_INTERN
            e += rf._TERMINAL_AU if tt > 2 else 0
            unpaired_in = {u for u in range(i + 1, j) if u not in paired}
            e += rf._ML_BASE * len(unpaired_in)
            ends = [(((i + 1), rf._DANGLE3[tt][s[i + 1]]),
                     ((j - 1), rf._DANGLE5[tt][s[j - 1]]))]
            for (p, q) in cs:
                tb = ptype[(p, q)]
                e += rf._ML_INTERN + (rf._TERMINAL_AU if tb > 2 else 0)
                ends.append((((p - 1), rf._DANGLE5[tb][s[p - 1]]),
                             ((q + 1), rf._DANGLE3[tb][s[q + 1]])))
            if dangles == 2:
                for (pa, ea), (pb, eb) in ends:
                    e += ea + eb
            else:
                e += _best_dangle_assignment(ends, unpaired_in, n)

    # exterior loop
    unpaired_ext = set()
    covered = {u for (i, j) in ext for u in range(i, j + 1)}
    unpaired_ext = {u for u in range(1, n + 1) if u not in covered}
    ends = []
    for (p, q) in ext:
        tb = ptype[(p, q)]
        e += rf._TERMINAL_AU if tb > 2 else 0
        ends.append((((p - 1) if p > 1 else None, rf._DANGLE5[tb][s[p - 1]]),
                     ((q + 1) if q < n else None,
                      rf._DANGLE3[tb][s[q + 1]] if q < n else 0)))
    if dangles == 2:
        for (pa, ea), (pb, eb) in ends:
            e += (ea if pa is not None else 0) + (eb if pb is not None else 0)
    else:
        e += _best_dangle_assignment(ends, unpaired_ext, n)
    return e


def _brute_mfe(seq, dangles):
    rna = seq.upper().replace("T", "U")
    n = len(rna)
    s = [0] + [rf._BASE.get(ch, 0) for ch in rna] + [0]
    structures = _enum_structures(s, 1, n, {})
    return min(_eval_structure(rna, s, pairs, dangles)
               for pairs in structures) / 100.0


@pytest.mark.parametrize("dangles", [1, 2])
def test_exhaustive_enumeration_oracle(dangles):
    """fold_mfe == brute-force min over all structures, n <= 13 (covers
    hairpins, stacks, bulges, interior loops, multiloops, all dangle
    corner cases)."""
    rng = np.random.default_rng(101)
    seqs = ["".join("ACGU"[c] for c in rng.integers(0, 4, size=int(ln)))
            for ln in rng.integers(5, 14, size=40)]
    # structured adversaries: multiloop-capable, tetraloop, strong stems
    seqs += ["GGCGAAACGCGAAACGC", "GGGGCUUCGGCCCC"[:13], "GCGAAAGCGAAAG",
             "GGGAAACCCAAAG", "AUGCAUGCAUGCA", "GGGGAAAACCCC",
             "UUUGGGAAACCCU", "GCCGGAAAUCCGG"]
    for seq in seqs:
        assert fold_mfe(seq, dangles) == pytest.approx(
            _brute_mfe(seq, dangles), abs=1e-9), (seq, dangles)


def test_native_batch_matches_python():
    """The C++ batch fold must agree with the Python DP exactly (it is built
    from the same parameter blob; skip silently if no compiler)."""
    from flashfry_tpu.native import get_native
    if get_native() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    seqs = ["".join("ACGU"[c] for c in rng.integers(0, 4, size=int(ln)))
            for ln in rng.integers(5, 25, size=200)]
    for dangles in (1, 2):
        batch = fold_mfe_batch(seqs, dangles)
        for seq, e in zip(seqs, batch):
            assert e == pytest.approx(fold_mfe(seq, dangles), abs=1e-9)


def test_batched_model_scoring_matches_per_guide():
    m = RNAFold4j()
    m.valid_over_enzyme(Cas9ParameterPack)
    m.smallest_guide = 18
    m.setup()

    class FakeGuide:
        def __init__(self, bases):
            self.bases = bases
            self.named_annotations = {}

    rng = np.random.default_rng(3)
    guides = [FakeGuide("".join("ACGT"[c] for c in rng.integers(0, 4, size=23)))
              for _ in range(20)]
    m.score_guides(guides, None, None, Cas9ParameterPack)
    for g in guides:
        expect = m.score_guide(g)
        for col, vals in zip(m.header_columns(), expect):
            assert g.named_annotations[col] == vals


def test_model_columns_and_scoring():
    m = RNAFold4j()
    assert m.valid_over_enzyme(Cas9ParameterPack)
    m.smallest_guide = 20
    m.setup()
    assert m.header_columns() == ["FreeEnergy20"]

    class FakeGuide:
        bases = "GCCAGGAAGTACTCGAGTACTTCC"[:20] + "TGG"  # 20mer guide + PAM

    scores = m.score_guide(FakeGuide())
    assert len(scores) == 1 and len(scores[0]) == 1
    assert float(scores[0][0]) == fold_mfe(FakeGuide.bases[:20])


def test_model_multiple_lengths():
    m = RNAFold4j()
    m.valid_over_enzyme(Cas9ParameterPack)
    m.smallest_guide = 18
    m.setup()
    assert m.header_columns() == ["FreeEnergy18", "FreeEnergy19", "FreeEnergy20"]

    m5 = RNAFold4j()
    m5.valid_over_enzyme(Cpf1ParameterPack)
    m5.smallest_guide = 19
    m5.setup()
    # 5' PAM: guide slices start after the PAM (RNAFold4j.scala:33-36)
    ln, start, stop = m5._length_positions[0]
    assert (ln, start, stop) == (19, Cpf1ParameterPack.guide_range[0],
                                 Cpf1ParameterPack.guide_range[0] + 19)
