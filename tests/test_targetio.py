"""Tab-delimited I/O parity tests (TabDelimitedHanderTest.scala)."""

import hashlib
import io
import os
import re

import numpy as np
import pytest

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.positions import BitPosition
from flashfry_tpu.standards import Cas9ParameterPack
from flashfry_tpu.targetio import (parse_input, write_guide_line, write_header)

FAKE_SITES = "/root/reference/test_data/fake.sites"


def build_registry(txt):
    pos = BitPosition()
    seen = []
    for m in re.finditer(r"<([^>]+)>", txt):
        for p in m.group(1).split("|"):
            c = p.split(":")[0]
            if c not in seen:
                seen.append(c)
    for c in seen:
        pos.add_reference(c)
    return pos


@pytest.mark.skipif(not os.path.exists(FAKE_SITES), reason="reference fixture unavailable")
def test_fake_sites_byte_identical_roundtrip():
    # TabDelimitedHanderTest.scala:40-52 — md5 of rewritten output equals input
    enc = BitEncoding(Cas9ParameterPack)
    txt = open(FAKE_SITES).read()
    pos = build_registry(txt)
    parsed = parse_input(FAKE_SITES, enc, pos, 2 ** 31 - 1, filter_out_overflowed=False)
    assert len(parsed.guides) == 99

    out = io.StringIO()
    out.write(write_header([], True))
    for g in parsed.guides:
        out.write(write_guide_line(g, enc, pos, [], True, True))
    assert hashlib.md5(out.getvalue().encode()).hexdigest() == \
        hashlib.md5(txt.encode()).hexdigest()


def test_roundtrip_without_positions(tmp_path):
    """Positionless OT tokens survive a parse + rewrite."""
    enc = BitEncoding(Cas9ParameterPack)
    pos = BitPosition()
    pos.add_reference("chr1")
    content = (
        "contig\tstart\tstop\ttarget\tcontext\toverflow\torientation\totCount\toffTargets\n"
        "chr1\t10\t33\tGACTTGCATCCGAAGCCGGTGGG\tNONE\tOK\tFWD\t3\t"
        "GACTTGCATCCGAAGCCGGTGGG_2_0,GACCTGCATACGAAGCCTTTGGG_1_4\n")
    p = tmp_path / "in.sites"
    p.write_text(content)
    parsed = parse_input(str(p), enc, pos, 2 ** 31 - 1)
    out = io.StringIO()
    out.write(write_header([], True))
    for g in parsed.guides:
        out.write(write_guide_line(g, enc, pos, [], True, False))
    assert out.getvalue() == content


def test_overflow_guide_filtering(tmp_path):
    enc = BitEncoding(Cas9ParameterPack)
    pos = BitPosition()
    content = (
        "contig\tstart\tstop\ttarget\tcontext\toverflow\torientation\totCount\toffTargets\n"
        "chr1\t10\t33\tGACTTGCATCCGAAGCCGGTGGG\tNONE\tOVERFLOW\tFWD\t1\t"
        "GACTTGCATCCGAAGCCGGTGGG_1_0\n"
        "chr1\t50\t73\tAAAAACCCCCGGGGGTTTTAGGG\tNONE\tOK\tFWD\t0\t\n")
    p = tmp_path / "in.sites"
    p.write_text(content)
    kept = parse_input(str(p), enc, pos, 2 ** 31 - 1, filter_out_overflowed=True)
    assert len(kept.guides) == 1
    assert kept.guides[0].bases == "AAAAACCCCCGGGGGTTTTAGGG"
    unfiltered = parse_input(str(p), enc, pos, 2 ** 31 - 1, filter_out_overflowed=False)
    assert len(unfiltered.guides) == 2
    assert unfiltered.guides[0].inherited_overflow


def test_max_mismatch_filters_ots(tmp_path):
    enc = BitEncoding(Cas9ParameterPack)
    pos = BitPosition()
    content = (
        "contig\tstart\tstop\ttarget\tcontext\toverflow\torientation\totCount\toffTargets\n"
        "chr1\t10\t33\tGACTTGCATCCGAAGCCGGTGGG\tNONE\tOK\tFWD\t2\t"
        "GACTTGCATCCGAAGCCGGTGGG_1_0,GACCTGCATACGAAGCCTTTGGG_1_4\n")
    p = tmp_path / "in.sites"
    p.write_text(content)
    parsed = parse_input(str(p), enc, pos, 2)
    assert len(parsed.guides[0].off_targets) == 1  # the mm=3 OT is dropped
