"""Host-phase microbenchmarks: OT rendering, TSV parsing, score models.

Workload mirrors the paper's heavy case (1000 guides x 2000 off-target
positions each — the `--maximumOffTargets` default cap), the case where the
reference's JVM epilogue takes ~1 minute and a naive Python epilogue takes
minutes. Run: python tools/bench_host.py [n_guides] [ots_per_guide]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.positions import BitPosition
from flashfry_tpu.standards import Cas9ParameterPack
from flashfry_tpu.targetio import GuideWithOffTargets, parse_input, write_output


def build_guides(n_guides, n_ots, enc, pos_enc, rng):
    L = 23
    guides = []
    # random guides and OTs as code matrices -> packed longs
    def pack(codes):
        out = np.zeros(codes.shape[0], dtype=np.uint64)
        for i in range(L):
            out = (out << np.uint64(2)) | codes[:, i].astype(np.uint64)
        return out

    gcodes = rng.integers(0, 4, size=(n_guides, L))
    glongs = pack(gcodes) | (np.uint64(1) << np.uint64(48))
    base_map = np.frombuffer(b"ACGT", dtype=np.uint8)
    for gi in range(n_guides):
        bases = bytes(base_map[gcodes[gi]]).decode()
        # cap above n_ots: guides at exactly the cap are "full" and the score
        # module's parse filters them out (filter_out_overflowed)
        g = GuideWithOffTargets("chrT", gi * 30, bases, True, None, int(glongs[gi]),
                                overflow_cap=max(2000, n_ots + 1))
        # OTs: guide with up to 4 mutated positions (mismatch <= 4)
        oc = np.repeat(gcodes[gi][None, :], n_ots, axis=0)
        for k in range(4):
            pos = rng.integers(0, 20, size=n_ots)
            oc[np.arange(n_ots), pos] = rng.integers(0, 4, size=n_ots)
        longs = pack(oc) | (np.uint64(1) << np.uint64(48))
        coords = BitPosition.encode_batch(
            np.ones(n_ots, dtype=np.uint64),
            rng.integers(0, 1 << 27, size=n_ots).astype(np.uint64),
            np.full(n_ots, L, dtype=np.uint64),
            rng.integers(0, 2, size=n_ots).astype(bool))
        offs = np.arange(n_ots + 1, dtype=np.int64)
        g.set_ots_arrays(longs, coords, offs)
        guides.append(g)
    return guides


def main():
    n_guides = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_ots = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rng = np.random.default_rng(11)
    enc = BitEncoding(Cas9ParameterPack)
    pos_enc = BitPosition()
    pos_enc.add_reference("chrT")

    t0 = time.time()
    guides = build_guides(n_guides, n_ots, enc, pos_enc, rng)
    print("build: %.2fs (%d guides x %d OTs)" % (time.time() - t0, n_guides, n_ots))

    out = "/tmp/bench_host.sites"
    t0 = time.time()
    write_output(out, guides, enc, pos_enc, (), True, True)
    t_render = time.time() - t0
    print("render+write (positions): %.2fs  (%.0f MB)" %
          (t_render, os.path.getsize(out) / 1e6))

    t0 = time.time()
    parsed = parse_input(out, enc, pos_enc, 2 ** 31 - 1, filter_out_overflowed=True)
    t_parse = time.time() - t0
    print("parse: %.2fs (%d guides)" % (t_parse, len(parsed.guides)))

    from flashfry_tpu.scoring import get_registered_scoring_metric
    for name in ("doench2016cfd", "hsu2013", "jostandsantos", "minot", "dangerous"):
        m = get_registered_scoring_metric(name, enc, "", Cas9ParameterPack,
                                          -1, "", False, False, 1)
        assert m.valid_over_enzyme(Cas9ParameterPack)
        m.bit_encoder(enc)
        m.setup()
        t0 = time.time()
        m.score_guides(parsed.guides, enc, pos_enc, Cas9ParameterPack)
        print("score %-16s %.2fs" % (name, time.time() - t0))

    t0 = time.time()
    write_output("/tmp/bench_host.scored", parsed.guides, enc, pos_enc, (), True, True)
    print("re-render scored: %.2fs" % (time.time() - t0))


if __name__ == "__main__":
    main()
