"""Ported reference utility tests (utils/UtilsTest.scala,
crispr/GuideMemoryStorageTest.scala)."""

import numpy as np
import pytest

from flashfry_tpu.utils import (entropy, gc_content, longest_homopolymer,
                                median, reverse_comp_string)


def test_gc_content_goldens():
    # UtilsTest.scala:10-18
    assert gc_content("AACC") == 0.5
    assert gc_content("aaCC") == 0.5
    assert gc_content("CaCC") == 0.75
    assert gc_content("GaCC") == 0.75
    assert gc_content("AaCt") == 0.25
    assert gc_content("aaaa") == 0.0
    assert gc_content("GGGG") == 1.0


def test_longest_homopolymer_goldens():
    # UtilsTest.scala:61-71
    assert longest_homopolymer("AAAAATTCC") == 5
    assert longest_homopolymer("ACTGACGT") == 1
    assert longest_homopolymer("AACCTTGG") == 2
    assert longest_homopolymer("AATTTTTGG") == 5


def test_entropy_golden():
    # UtilsTest.scala:73-77
    assert entropy("AAAAATTCC") == pytest.approx(1.435521, abs=0.01)


def test_reverse_comp():
    # UtilsTest.scala:79-83
    assert reverse_comp_string("AG") == "CT"


def test_median_reference_semantics():
    # Utils.scala:215-224 — even length -> mean of the middle two
    assert median([1, 2, 3]) == 2.0
    assert median([1, 2, 3, 4]) == 2.5
    assert median([5]) == 5.0


def test_gc_filter_drops_low_gc_guides():
    """GuideMemoryStorageTest.scala:27-49 through the discover GC filter:
    gc >= low and gc <= high keeps the guide, bounds inclusive."""
    from flashfry_tpu.database import build_database_from_sites
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.engine import discover
    from flashfry_tpu.standards import Cas9NGGParameterPack

    rng = np.random.default_rng(3)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=5000))
    sites = find_target_sites(iter([("c", genome)]), Cas9NGGParameterPack)
    db = build_database_from_sites(sites, 7)
    gsites = find_target_sites(iter([("g", genome[:500])]), Cas9NGGParameterPack)
    gcs = [gc_content(b) for b in gsites.bases()]
    lo = sorted(gcs)[len(gcs) // 2]

    all_guides = discover(db, gsites, max_mismatch=1, backend="numpy")
    kept = discover(db, gsites, max_mismatch=1, backend="numpy",
                    min_gc=lo, max_gc=1.0)
    expected = sum(1 for g in gcs if lo <= g <= 1.0)
    assert len(kept) == expected < len(all_guides)
    # bounds are inclusive: min_gc exactly at a guide's GC keeps it
    assert any(abs(gc_content(k.bases) - lo) < 1e-12 for k in kept)
