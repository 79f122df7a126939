"""Re-probe the max-guide-block size at library-like conditions after the
round-5 stage-2/compaction rework (round-4 verdict: 2048 was 2.5x slower
at library scale — does that still hold?). Scans 8192 position-sampled
guides (8 blocks at 1024 vs 4 at 2048), interleaved A/B."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import flashfry_tpu.ops.scan as S
from flashfry_tpu.ops.scan import DeviceScanner

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main():
    db = bench.get_database(3000)
    rng = np.random.default_rng(11)
    guide_longs = bench.sample_guides(db, 8192, rng)

    import jax.numpy as jnp
    import jax
    np.asarray(jnp.zeros((), jnp.float32) + 1)
    scanner = DeviceScanner(db)
    scanner._caps[4] = (8192, 524288)
    print("scanner ready", flush=True)

    import flashfry_tpu.ops.scan as scan_mod

    def run(max_block):
        os.environ["FLASHFRY_TPU_MAX_BLOCK"] = str(max_block)
        n = 0
        for t, g, m in scanner.scan(guide_longs, 4):
            n += np.asarray(t).size
        return n

    hits = {}
    for mb in (1024, 2048):
        t0 = time.time()
        hits[mb] = run(mb)
        print("warm block<=%d: %.2fs, %d hits, caps %s"
              % (mb, time.time() - t0, hits[mb], scanner._caps.get(4)),
              flush=True)
    assert hits[1024] == hits[2048], hits

    times = {1024: [], 2048: []}
    for rnd in range(3):
        for mb in (1024, 2048):
            t0 = time.time()
            n = run(mb)
            dt = time.time() - t0
            assert n == hits[mb]
            times[mb].append(dt)
            print("round %d block<=%d: %.3fs" % (rnd, mb, dt), flush=True)
    for mb in (1024, 2048):
        print("block<=%d: min %.3fs %s" % (mb, min(times[mb]),
                                           [round(x, 3) for x in times[mb]]),
              flush=True)


if __name__ == "__main__":
    main()
