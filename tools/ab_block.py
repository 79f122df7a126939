"""Re-probe the max-guide-block size at library-like conditions after the
round-5 stage-2/compaction rework (round-4 verdict: 2048 was 2.5x slower
at library scale — retired; see ops/scan.py block-size history). Scans
8192 position-sampled guides per arm, interleaved A/B, with the sticky
per-mm caps RESET to each arm's own settle point before every run so one
arm's escalation cannot contaminate the other's timings."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flashfry_tpu.ops.scan import DeviceScanner
import bench

ARMS = (1024, 2048)


def main():
    db = bench.get_database(3000)
    rng = np.random.default_rng(11)
    guide_longs = bench.sample_guides(db, 8192, rng)
    if os.environ.get("AB_BLOCK_SHUFFLE"):
        rng.shuffle(guide_longs)  # position-like order (not sequence-sorted)

    import jax.numpy as jnp
    np.asarray(jnp.zeros((), jnp.float32) + 1)
    scanner = DeviceScanner(db)
    print("scanner ready", flush=True)

    def run(mb, caps):
        os.environ["FLASHFRY_TPU_MAX_BLOCK"] = str(mb)
        scanner._caps[4] = list(caps)
        n = 0
        for t, g, m in scanner.scan(guide_longs, 4):
            n += np.asarray(t).size
        return n

    # warm each arm from the same baseline; record each arm's OWN settle
    hits, settled = {}, {}
    for mb in ARMS:
        t0 = time.time()
        hits[mb] = run(mb, (8192, 524288))
        settled[mb] = tuple(scanner._caps[4])
        print("warm block<=%d: %.2fs, %d hits, settled caps %s"
              % (mb, time.time() - t0, hits[mb], settled[mb]), flush=True)
    assert len(set(hits.values())) == 1, hits

    times = {mb: [] for mb in ARMS}
    for rnd in range(3):
        for mb in ARMS:
            t0 = time.time()
            n = run(mb, settled[mb])
            dt = time.time() - t0
            assert n == hits[mb]
            times[mb].append(dt)
            print("round %d block<=%d caps=%s: %.3fs"
                  % (rnd, mb, settled[mb], dt), flush=True)
    for mb in ARMS:
        print("block<=%d: min %.3fs %s" % (mb, min(times[mb]),
                                           [round(x, 3) for x in times[mb]]),
              flush=True)


if __name__ == "__main__":
    main()
