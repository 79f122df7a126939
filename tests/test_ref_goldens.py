"""Ports of the last reference test files without direct counterparts:
CRISPRHitTest.scala, BaseCombinationGeneratorTest.scala, BaseTest.scala."""

import numpy as np

from flashfry_tpu.bitcoding import BitEncoding, all_bins
from flashfry_tpu.javafmt import scala_hashmap_iteration_order
from flashfry_tpu.positions import BitPosition
from flashfry_tpu.standards import Cas9ParameterPack
from flashfry_tpu.targetio import (GuideWithOffTargets, OffTargetHit,
                                   render_ot_tokens)


# ---------------------------------------------------------------------------
# CRISPRHitTest.scala — per-OT score key-value output
# ---------------------------------------------------------------------------

def _guide_with_scored_ot(scores):
    enc = BitEncoding(Cas9ParameterPack)
    pos = BitPosition()
    pos.add_reference("chr1")
    seq = "GACTTGCATCCGAAGCCGGTGGG"
    long = int(enc.encode(seq, 1))
    g = GuideWithOffTargets("chr1", 10, seq, True, None, long,
                            overflow_cap=2000)
    hit = OffTargetHit(long, np.array([pos.encode("chr1", 100, 23, True)],
                                      dtype=np.uint64))
    for k, v in scores:
        hit.add_score(k, v)
    g.add_ot(hit)
    return g, enc, pos


def test_crisprhit_single_score_output():
    # CRISPRHitTest.scala:9-15: addScore("test","value") -> "{test=value}"
    g, enc, pos = _guide_with_scored_ot([("test", "value")])
    tok = render_ot_tokens([g], enc, pos, write_positions=True)[0]
    assert tok.endswith("{test=value}"), tok


def test_crisprhit_multi_score_output():
    # CRISPRHitTest.scala:17-24: the golden "{test2=value2!test=value}" pins
    # Scala mutable.HashMap iteration order, which the renderer emulates
    g, enc, pos = _guide_with_scored_ot([("test", "value"),
                                         ("test2", "value2")])
    tok = render_ot_tokens([g], enc, pos, write_positions=True)[0]
    assert tok.endswith("{test2=value2!test=value}"), tok


def test_scala_hashmap_order_golden():
    assert scala_hashmap_iteration_order(["test", "test2"]) == \
        ["test2", "test"]
    # singletons and stability under subsetting (per-hit score subsets)
    full = scala_hashmap_iteration_order(["a", "b", "c", "d"])
    sub = scala_hashmap_iteration_order(["a", "c"])
    assert [k for k in full if k in ("a", "c")] == sub


# ---------------------------------------------------------------------------
# BaseCombinationGeneratorTest.scala — complete unique 4^7 kmer set
# ---------------------------------------------------------------------------

def test_base_combinations_width7_complete_and_unique():
    bins = all_bins(7)
    assert len(bins) == 16384  # 4^7
    assert len(set(bins)) == 16384
    assert all(len(b) == 7 and set(b) <= set("ACGT") for b in bins)
    # lexicographic A < C < G < T order (BaseCombinationGenerator semantics)
    assert bins == sorted(bins)
    assert bins[0] == "AAAAAAA" and bins[-1] == "TTTTTTT"


# ---------------------------------------------------------------------------
# BaseTest.scala — base <-> int conversion
# ---------------------------------------------------------------------------

def test_base_to_int_and_back():
    enc = BitEncoding(Cas9ParameterPack)
    for code, base in enumerate("ACGT"):
        # encode a single repeated base: every 2-bit field equals `code`
        long = int(enc.encode(base * 23, 1))
        assert (long >> (2 * 22)) & 3 == code
        decoded, _ = enc.decode(np.uint64(long))
        assert decoded == base * 23
