"""Differential tests: the native (C++) OT-token renderer/parser and the
pure-python fallbacks must be byte-equivalent on randomized guide sets,
and render -> parse -> render must be a fixed point."""

import numpy as np
import pytest

from flashfry_tpu import native
from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.positions import BitPosition
from flashfry_tpu.standards import Cas9ParameterPack
from flashfry_tpu.targetio import (GuideWithOffTargets, OffTargetHit,
                                   parse_input, render_ot_tokens, write_output)

ENC = BitEncoding(Cas9ParameterPack)
L = 23


def _random_guides(rng, n_guides=40, max_ots=30, with_scores=False):
    pos_enc = BitPosition()
    for name in ("chr1", "chr22_KI270879v1_alt", "x"):
        pos_enc.add_reference(name)
    base_map = np.frombuffer(b"ACGT", dtype=np.uint8)

    def pack(codes):
        out = np.zeros(codes.shape[0], dtype=np.uint64)
        for i in range(L):
            out = (out << np.uint64(2)) | codes[:, i].astype(np.uint64)
        return out

    guides = []
    for gi in range(n_guides):
        gcodes = rng.integers(0, 4, size=(1, L))
        bases = bytes(base_map[gcodes[0]]).decode()
        g = GuideWithOffTargets("chr1", gi * 31, bases, bool(rng.integers(2)),
                                None, int(pack(gcodes)[0] | (1 << 48)),
                                overflow_cap=2000)
        n_ots = int(rng.integers(0, max_ots))
        for oi in range(n_ots):
            ocodes = gcodes.copy()
            for _ in range(int(rng.integers(0, 5))):
                ocodes[0, rng.integers(0, 20)] = rng.integers(0, 4)
            count = int(rng.integers(1, 5))
            if rng.random() < 0.15:
                # parsed-without-positions style hit
                hit = OffTargetHit(int(pack(ocodes)[0] | (count << 48)),
                                   np.zeros(count, dtype=np.uint64), False)
            else:
                coords = BitPosition.encode_batch(
                    rng.integers(1, 4, size=count).astype(np.uint64),
                    rng.integers(0, 1 << 28, size=count).astype(np.uint64),
                    np.full(count, L, dtype=np.uint64),
                    rng.integers(0, 2, size=count).astype(bool))
                hit = OffTargetHit(int(pack(ocodes)[0] | (count << 48)), coords)
            if with_scores and rng.random() < 0.5:
                hit.add_score("Doench2016CFDScore", "0.%d" % rng.integers(1, 999))
            g.add_ot(hit)
        guides.append(g)
    return guides, pos_enc


@pytest.mark.skipif(native.get_native() is None, reason="no native lib")
@pytest.mark.parametrize("write_positions", [False, True])
@pytest.mark.parametrize("with_scores", [False, True])
def test_native_render_equals_python(monkeypatch, write_positions, with_scores):
    rng = np.random.default_rng(91)
    guides, pos_enc = _random_guides(rng, with_scores=with_scores)
    native_toks = render_ot_tokens(guides, ENC, pos_enc, write_positions)
    monkeypatch.setattr(native, "get_native", lambda: None)
    python_toks = render_ot_tokens(guides, ENC, pos_enc, write_positions)
    assert native_toks == python_toks


@pytest.mark.skipif(native.get_native() is None, reason="no native lib")
def test_native_parse_equals_python(monkeypatch, tmp_path):
    rng = np.random.default_rng(92)
    guides, pos_enc = _random_guides(rng, with_scores=True)
    path = str(tmp_path / "g.sites")
    write_output(path, guides, ENC, pos_enc, (), True, True)

    a = parse_input(path, ENC, pos_enc, 4)
    monkeypatch.setattr(native, "get_native", lambda: None)
    b = parse_input(path, ENC, pos_enc, 4)
    assert len(a.guides) == len(b.guides)
    for x, y in zip(a.guides, b.guides):
        assert x.bases == y.bases
        assert x.current_total == y.current_total
        ax, ay = x.ot_arrays(), y.ot_arrays()
        assert ax[0].tolist() == ay[0].tolist()
        assert ax[1].tolist() == ay[1].tolist()
        assert ax[2].tolist() == ay[2].tolist()
        assert ax[3].tolist() == ay[3].tolist()
        def norm(g):
            # columns may omit trailing Nones; pad for comparison
            if not g.ot_score_cols:
                return g.ot_score_cols or {}
            return {k: v + [None] * (g.num_ots - len(v))
                    for k, v in g.ot_score_cols.items()}
        assert norm(x) == norm(y)


def test_render_parse_render_fixed_point(tmp_path):
    rng = np.random.default_rng(93)
    guides, pos_enc = _random_guides(rng, with_scores=True)
    p1 = str(tmp_path / "a.sites")
    p2 = str(tmp_path / "b.sites")
    write_output(p1, guides, ENC, pos_enc, (), True, True)
    parsed = parse_input(p1, ENC, pos_enc, 2 ** 31 - 1)
    write_output(p2, parsed.guides, ENC, pos_enc, (), True, True)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_mismatch_cap_drops_tokens(tmp_path):
    """Parsing with a small maxMismatch drops far tokens but keeps order."""
    rng = np.random.default_rng(94)
    guides, pos_enc = _random_guides(rng)
    path = str(tmp_path / "g.sites")
    write_output(path, guides, ENC, pos_enc, (), True, True)
    strict = parse_input(path, ENC, pos_enc, 1)
    loose = parse_input(path, ENC, pos_enc, 2 ** 31 - 1)
    for s, l, orig in zip(strict.guides, loose.guides, guides):
        mm_all = ENC.mismatches(np.uint64(orig.long_encoding), l.ot_arrays()[0])
        expect = l.ot_arrays()[0][mm_all <= 1]
        assert s.ot_arrays()[0].tolist() == expect.tolist()
