"""FlashFry on-disk format interop.

The checked-in reference fixture test_data/test_blockAACCTTGG.binary was
written by the reference implementation itself (BlockManagerTest.scala:
105-116), so decoding it with OUR bit/position codecs is a true
cross-implementation golden test.
"""

import os

import numpy as np
import pytest

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.database import build_database_from_sites
from flashfry_tpu.discovery import find_target_sites
from flashfry_tpu.engine import discover
from flashfry_tpu.ffformat import (encode_block_longs, export_flashfry_database,
                                   import_flashfry_database, parse_block_longs)
from flashfry_tpu.positions import BitPosition
from flashfry_tpu.standards import (Cas9ParameterPack, Cas9NGGParameterPack,
                                    Cpf1ParameterPack)

FIXTURE = "/root/reference/test_data/test_blockAACCTTGG.binary"


def load_fixture_longs():
    # the fixture was written with java.io.DataOutputStream: big-endian,
    # first long = number of longs (BlockManagerTest.scala:105-116)
    raw = np.fromfile(FIXTURE, dtype=">u8")
    n = int(raw[0])
    assert raw.shape[0] == n + 1
    return raw[1:].astype(np.uint64)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_reference_fixture_decodes_with_our_codecs():
    longs = load_fixture_longs()
    assert longs.shape[0] % 2 == 0
    targets = longs[0::2]
    positions = longs[1::2]
    enc = BitEncoding(Cas9ParameterPack)
    pos = BitPosition()
    pos.add_reference("chr22")
    for t in targets[:200]:
        s, count = enc.decode(int(t))
        assert len(s) == 23
        assert s.startswith("AACCTTGG")
        assert count == 1
        assert s[-2:] in ("GG", "AG")  # Cas9ParameterPack pam set (NGG/NAG)
    for p in positions[:200]:
        contig, start, length, fwd = pos.decode(int(p))
        assert (contig, start, length, fwd) == ("chr22", 1, 23, True)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_reference_fixture_parses_as_linear_block():
    longs = load_fixture_longs()
    block = np.concatenate([np.array([1], np.uint64), longs])
    targets, pos_lists = parse_block_longs(block, 8)
    assert targets.shape[0] == longs.shape[0] // 2
    assert all(len(p) == 1 for p in pos_lists)
    assert np.array_equal(targets, longs[0::2])


def _random_db(pack, n, bin_width, seed=31):
    rng = np.random.default_rng(seed)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=n))
    sites = find_target_sites(iter([("chrR", genome), ("chrQ", genome[: n // 3])]), pack)
    return build_database_from_sites(sites, bin_width), genome


@pytest.mark.parametrize("pack,bin_width,n", [
    (Cas9NGGParameterPack, 7, 80_000),    # all-linear bins
    (Cas9NGGParameterPack, 1, 120_000),   # >500 targets/bin -> indexed blocks
    (Cpf1ParameterPack, 1, 120_000),      # 5'-PAM: always linear
])
def test_export_import_roundtrip(tmp_path, pack, bin_width, n):
    db, _ = _random_db(pack, n, bin_width)
    if bin_width == 1:
        assert db.bin_target_counts().max() > 500  # indexed path really taken
    path = str(tmp_path / "ffdb")
    export_flashfry_database(db, path)
    back = import_flashfry_database(path)
    assert back.pack is db.pack
    assert back.bin_width == db.bin_width
    assert back.contig_names == db.contig_names
    assert np.array_equal(back.targets, db.targets)
    assert np.array_equal(back.positions, db.positions)
    assert np.array_equal(back.pos_offsets, db.pos_offsets)
    assert np.array_equal(back.bin_start, db.bin_start)


def test_exported_header_matches_reference_line_format(tmp_path):
    db, _ = _random_db(Cas9NGGParameterPack, 30_000, 2)
    path = str(tmp_path / "ffdb")
    export_flashfry_database(db, path)
    lines = open(path + ".header").read().splitlines()
    assert lines[0] == str(0x1234ABCDE123890)  # BinaryConstants.scala:24
    assert lines[1] == "1"
    assert lines[2] == "3"                   # spcas9ngg enzyme index
    assert lines[3] == "16"
    assert lines[4].startswith("AA=")
    assert len(lines[4].split("=")[1].split(",")) == 3
    assert lines[-2] == "chrR=1"
    assert lines[-1] == "chrQ=2"


def test_discover_on_imported_db_matches(tmp_path):
    db, genome = _random_db(Cas9NGGParameterPack, 60_000, 7, seed=41)
    path = str(tmp_path / "ffdb")
    export_flashfry_database(db, path)
    back = import_flashfry_database(path)
    gsites = find_target_sites(iter([("g", genome[1000:1500])]),
                               Cas9NGGParameterPack,
                               flanking_sequence=6, capture_context=True)
    a = discover(db, gsites, max_mismatch=4, backend="numpy")
    b = discover(back, gsites, max_mismatch=4, backend="numpy")
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.bases == y.bases
        assert [ot.sequence for ot in x.off_targets] == [ot.sequence for ot in y.off_targets]
        assert [list(ot.coordinates) for ot in x.off_targets] == \
            [list(ot.coordinates) for ot in y.off_targets]


def test_bgzf_bsize_fields_tile_the_file(tmp_path):
    """Each member's BSIZE extra field must equal its true length - 1 (the
    htsjdk contract our reader doesn't rely on, so check it explicitly)."""
    import struct
    db, _ = _random_db(Cas9NGGParameterPack, 20_000, 2, seed=47)
    path = str(tmp_path / "ffdb")
    export_flashfry_database(db, path)
    data = open(path, "rb").read()
    pos = 0
    n_blocks = 0
    while pos < len(data):
        assert data[pos:pos + 4] == b"\x1f\x8b\x08\x04"
        assert data[pos + 12:pos + 16] == b"BC\x02\x00"
        bsize = struct.unpack("<H", data[pos + 16:pos + 18])[0]
        pos += bsize + 1
        n_blocks += 1
    assert pos == len(data)
    assert n_blocks >= 2  # payload block(s) + EOF marker


def test_bgzf_stream_is_standard_gzip(tmp_path):
    """The exported stream must be readable by plain gzip tooling (BGZF is a
    gzip-compatible profile)."""
    import gzip
    db, _ = _random_db(Cas9NGGParameterPack, 20_000, 2, seed=43)
    path = str(tmp_path / "ffdb")
    export_flashfry_database(db, path)
    with gzip.open(path, "rb") as fh:
        raw = fh.read()
    n_longs = sum(
        1 + int(c) for c in (db.targets >> np.uint64(48)).astype(np.int64)
    ) + db.num_bins  # one type long per bin (all linear at this size? no —)
    assert len(raw) % 8 == 0
    assert len(raw) // 8 >= db.num_targets


def test_parse_block_longs_truncated_block_raises():
    """A target whose position count runs past the end of the block must
    raise — exactly when off + 1 + count > n (BlockManager.scala:229-237).
    Previously the garbled guard fired one long late, mis-slicing the final
    target's positions instead of raising."""
    enc = BitEncoding(Cas9NGGParameterPack)
    t1 = np.uint64(enc.encode("A" * 23, count=2))
    good = np.array([1, t1, 7, 8], dtype=np.uint64)  # type long + target + 2 pos
    targets, pos_lists = parse_block_longs(good, 7)
    assert targets.shape[0] == 1 and list(pos_lists[0]) == [7, 8]

    # count says 2 positions but only 1 follows: off=0, count=2, n=3 -> raise
    truncated = np.array([1, t1, 7], dtype=np.uint64)
    with pytest.raises(ValueError, match="exceed the block size"):
        parse_block_longs(truncated, 7)

    # boundary: count exactly fits -> no raise (off + 1 + count == n)
    t2 = np.uint64(enc.encode("C" * 23, count=1))
    exact = np.array([1, t2, 9], dtype=np.uint64)
    targets, pos_lists = parse_block_longs(exact, 7)
    assert list(pos_lists[0]) == [9]
