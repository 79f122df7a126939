"""Ports of the reference's StandardScanParametersTest, RandoCRISPRTest,
GuideMemoryStorageTest and CRISPRHitTest cases.

The reference asserts regex match counts (StandardScanParametersTest.scala);
our scanner is regex-free, so the equivalent contract is the number of sites
the vectorized finder reports on the same strings.
"""

import numpy as np
import pytest

from flashfry_tpu.discovery import find_target_sites
from flashfry_tpu.engine import discover
from flashfry_tpu.random_guides import RandoCRISPR
from flashfry_tpu.standards import (Cas9NAGParameterPack, Cas9NGGParameterPack,
                                    Cas9ParameterPack, Cas9ParameterPack19bp,
                                    Cpf1ParameterPack)
from flashfry_tpu.targetio import OffTargetHit
from flashfry_tpu.utils import comp_base, gc_content


def n_sites(seq, pack, fwd=None):
    sites = find_target_sites(iter([("t", seq)]), pack)
    if fwd is None:
        return len(sites)
    return int((sites.forward == fwd).sum())


# StandardScanParametersTest.scala:12-119 — same strings, same counts
CASES = [
    ("ATTTAAAAAACCCCCGGGGGGGG", Cas9ParameterPack, True, 1),
    ("ATTTAAAAAACCCCCGGGGGCGGG", Cas9ParameterPack, True, 2),
    ("CCTAAAAAAACCCCCGGGGGGGT", Cas9ParameterPack, False, 1),
    ("CCCTAAAAAAACCCCCGGGGGGGT", Cas9ParameterPack, False, 2),
    ("ATTTAAAAAACCCCCGGGGGGAG", Cas9NAGParameterPack, True, 1),
    ("CTTAAAAAAACCCCCGGGGGGGT", Cas9NAGParameterPack, False, 1),
    ("ATTTAAAAAACCCCCGGGGGCGG", Cas9NGGParameterPack, True, 1),
    ("CCTAAAAAAACCCCCGGGGGGGT", Cas9NGGParameterPack, False, 1),
    ("TTTAAAAAACCCCCGGGGGATAAA", Cpf1ParameterPack, True, 1),
    ("AATTAAAAAACCCCCGGGGGAAAA", Cpf1ParameterPack, False, 1),
    ("TTTAAAAAACCCCCGGGGGGGG", Cas9ParameterPack19bp, True, 1),
    ("TTTAAAAAACCCCCGGGGGCGGG", Cas9ParameterPack19bp, True, 2),
    ("CCTAAAAAAACCCCCGGGGGGG", Cas9ParameterPack19bp, False, 1),
    ("CCCTAAAAAAACCCCCGGGGGGG", Cas9ParameterPack19bp, False, 2),
]


@pytest.mark.parametrize("seq,pack,fwd,expected", CASES)
def test_scan_parameter_site_counts(seq, pack, fwd, expected):
    assert n_sites(seq, pack, fwd) == expected


# RandoCRISPRTest.scala:11-41
def _draws(pattern, set_length, n=100):
    r = RandoCRISPR(set_length, ["CGG"], False, "", 0, 0, pattern=pattern,
                    rng=__import__("random").Random(5))
    return [r._patterned_draw(pattern, set_length) for _ in range(n)]


def test_patterned_draw_fixed_bases():
    for d in _draws("A,C,T", 3, n=5):
        assert d == "ACT"


def test_patterned_draw_memorized():
    for d in _draws("N1,T,N1", 3):
        assert d[0] == d[2]
        assert d[1] == "T"


def test_patterned_draw_memorized_in_order():
    for d in _draws("N1,N2,T,N1,N2", 5):
        assert d[0] == d[3]
        assert d[1] == d[4]


def test_patterned_draw_memorized_complement():
    for d in _draws("N1,N2,T,N1-,N2-", 5):
        assert d[0] == comp_base(d[3])
        assert d[1] == comp_base(d[4])


def test_patterned_draw_unknown_base_rejected():
    r = RandoCRISPR(1, ["CGG"], False, "", 0, 0, pattern="Z")
    with pytest.raises(ValueError):
        r._patterned_draw("Z", 1)


# GuideMemoryStorageTest.scala:26-49 — GC filtering happens in discover
def test_gc_filter_semantics():
    assert gc_content("AAAAA") == 0.0
    assert gc_content("GGGGG") == 1.0
    assert gc_content("AAGG") == 0.5


# CRISPRHitTest.scala:8-22 — score key-value token formatting
def test_ot_score_tokens():
    hit = OffTargetHit(sequence=1, coordinates=np.zeros(1, np.uint64))
    hit.add_score("test", "value")
    assert hit.scores == {"test": "value"}
    hit.add_score("test2", "value2")
    # duplicate keys rejected (CRISPRHit.scala requires unique score names)
    with pytest.raises(AssertionError):
        hit.add_score("test", "other")
