"""A/B the fused-scan stage-2 variants on the real chip at settled caps.

Variants: (stage2_int8, trip_tile). Runs the full hg38-scale 1000-guide
mm=4 scan per variant, interleaved round-robin so the remote chip/tunnel
drift (2-3x over hours) cancels within a round. Prints per-variant times.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import flashfry_tpu.ops.scan as S
from flashfry_tpu.database import load_database
from flashfry_tpu.ops.scan import DeviceScanner

import bench

VARIANTS = [(True, 128), (False, 512), (True, 512), (False, 128)]


def main():
    mm = int(os.environ.get("AB_MM", "4"))
    db = bench.get_database(3000)
    rng = np.random.default_rng(7)
    guide_longs = bench.sample_guides(db, 1000, rng)

    import jax
    import jax.numpy as jnp
    t0 = time.time()
    np.asarray(jnp.zeros((), jnp.float32) + 1)
    print("jax init %.1fs platform=%s" % (time.time() - t0,
                                          S.default_platform()), flush=True)
    t0 = time.time()
    scanner = DeviceScanner(db)
    # settled library caps (pinned from the round-4 run)
    scanner._caps[mm] = (8192, 524288)
    print("scanner init %.1fs" % (time.time() - t0), flush=True)

    def run():
        n = 0
        for t, g, m in scanner.scan(guide_longs, mm):
            n += np.asarray(t).size
        return n

    hits = {}
    # warm (compile) each variant
    for v in VARIANTS:
        S.STAGE2_INT8, S.TRIP_TILE = v
        t0 = time.time()
        hits[v] = run()
        print("warm %s: %.2fs (compile+run), %d hits"
              % (v, time.time() - t0, hits[v]), flush=True)
    assert len(set(hits.values())) == 1, hits

    times = {v: [] for v in VARIANTS}
    for rnd in range(4):
        for v in VARIANTS:
            S.STAGE2_INT8, S.TRIP_TILE = v
            t0 = time.time()
            n = run()
            dt = time.time() - t0
            assert n == hits[v]
            times[v].append(dt)
            print("round %d %s: %.3fs" % (rnd, v, dt), flush=True)
    print("=== results (mm=%d, col=8192, trip=524288) ===" % mm)
    for v in VARIANTS:
        ts = sorted(times[v])
        print("int8=%-5s tile=%-4d min %.3fs med %.3fs  %s"
              % (v[0], v[1], ts[0], ts[len(ts) // 2],
                 [round(x, 3) for x in times[v]]), flush=True)


if __name__ == "__main__":
    main()
