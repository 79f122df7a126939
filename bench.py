"""Benchmark: guide-vs-database comparison throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (mirrors the reference paper's discover sweep, BASELINE.md):
  * synthetic chr22-scale genome (100 Mbp, fixed seed) -> prefix-binned
    database (~12M distinct targets), cached under /tmp between runs;
  * 1000 candidate guides (sampled from the database, as the paper's
    run_timing_collection.py samples real genomic guides);
  * discover scan at maxMismatch=4: stage-1 fused Pallas kernel (one-hot
    matmul on the MXU + threshold/reduce) + stage-2 hit gather.

vs_baseline: the reference (FlashFry, single-threaded JVM) performs packed
XOR+popcount comparisons at ~2e8/s on the paper's EC2 hardware (its
BitEncoding.mismatches is ~4-5ns/comparison in a tight loop; see
reference bitcoding/BitEncoding.scala:127-132 and the BitEncodingTest
"compare 1 million" timing test). vs_baseline = our comparisons/s / 2e8.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = "/tmp/flashfry_tpu_bench"
GENOME_MB = int(os.environ.get("BENCH_GENOME_MB", "400"))
N_GUIDES = int(os.environ.get("BENCH_GUIDES", "1000"))
MAX_MM = 4
FLASHFRY_BASELINE_CMP_PER_S = 2.0e8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_database():
    from flashfry_tpu.database import (build_database_from_sites, load_database,
                                       save_database)
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.standards import Cas9NGGParameterPack

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "bench_db_%dM.npz" % GENOME_MB)
    if os.path.exists(path):
        log("loading cached bench database", path)
        return load_database(path)
    log("building %d Mbp synthetic genome..." % GENOME_MB)
    rng = np.random.default_rng(2024)
    n = GENOME_MB * 1_000_000
    genome = rng.integers(0, 4, size=n, dtype=np.int8)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=1000))  # warm str path
    base_map = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome_str = bytes(base_map[genome]).decode("ascii")
    t0 = time.time()
    sites = find_target_sites(iter([("benchChr", genome_str)]), Cas9NGGParameterPack)
    log("site scan: %.1fs, %d sites" % (time.time() - t0, len(sites)))
    t0 = time.time()
    db = build_database_from_sites(sites, 7)
    log("db build: %.1fs, %d distinct targets" % (time.time() - t0, db.num_targets))
    save_database(db, path)
    return db


def discover_e2e(db, scanner, guide_longs, out_path):
    """Full discover epilogue: scan -> vectorized hit collection (overflow
    cap 2000) -> positionOutput TSV. The piece FlashFry's 65 s wall-clock is
    spent on (modules/OffTargetDiscovery.scala:79-153)."""
    from flashfry_tpu.bitcoding import STRING_MASK
    from flashfry_tpu.engine import _collect_hits
    from flashfry_tpu.targetio import GuideWithOffTargets, write_output

    guides = [
        GuideWithOffTargets("bench", i * 30, "", True, None,
                            int(g & STRING_MASK | (np.uint64(1) << np.uint64(48))),
                            overflow_cap=2000)
        for i, g in enumerate(guide_longs)]
    enc = db.bit_encoding()
    seqs, _ = enc.decode_batch(np.asarray(guide_longs, dtype=np.uint64))
    for g, s in zip(guides, seqs):
        g.bases = s
    t0 = time.time()
    _collect_hits(db, guides, scanner.scan(
        np.asarray([g.long_encoding for g in guides], dtype=np.uint64), MAX_MM))
    t_collect = time.time()
    write_output(out_path, guides, enc, db.bit_position(),
                 models=(), write_ots=True, write_positions=True)
    t_write = time.time()
    n_ots = sum(g.ot_count_total() for g in guides)
    return t_collect - t0, t_write - t_collect, n_ots


def main():
    db = get_database()
    from flashfry_tpu.ops.scan import DeviceScanner, default_platform

    n = db.num_targets
    rng = np.random.default_rng(7)
    guide_idx = rng.choice(n, size=N_GUIDES, replace=False)
    guide_longs = db.targets[guide_idx]

    platform = default_platform()
    log("platform:", platform)
    scanner = DeviceScanner(db)
    log("scan backend: %s" % ("pallas" if scanner.use_pallas else "jnp"))

    # warm-up (compile)
    t0 = time.time()
    n_hits = sum(len(t) for t, _, _ in scanner.scan(guide_longs, MAX_MM))
    log("warmup scan: %.2fs, %d hits" % (time.time() - t0, n_hits))

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        hits = 0
        for t, g, m in scanner.scan(guide_longs, MAX_MM):
            hits += len(t)
    dt = (time.time() - t0) / iters
    comparisons = N_GUIDES * n
    rate = comparisons / dt
    log("scan: %.3fs/iter, %d x %d = %.3g comparisons, %.3g cmp/s" %
        (dt, N_GUIDES, n, comparisons, rate))

    # end-to-end discover: scan + collection + positionOutput rendering.
    # FlashFry does 1000 guides / mm=4 / hg38 in 65.09 s (BASELINE.md).
    t0 = time.time()
    t_scan_collect, t_render, n_ots = discover_e2e(
        db, scanner, guide_longs, "/tmp/flashfry_tpu_bench_discover.out")
    e2e = time.time() - t0
    log("discover e2e: %.3fs (scan+collect %.3fs, render+write %.3fs, %d OT positions)"
        % (e2e, t_scan_collect, t_render, n_ots))

    print(json.dumps({
        "metric": "guide-vs-database comparisons/s/chip (1000 guides, mm=4, %dMbp genome)" % GENOME_MB,
        "value": round(rate),
        "unit": "comparisons/s",
        "vs_baseline": round(rate / FLASHFRY_BASELINE_CMP_PER_S, 2),
        "detail": {
            "platform": platform,
            "backend": "pallas" if scanner.use_pallas else "jnp",
            "targets": n,
            "guides": N_GUIDES,
            "seconds_per_scan": round(dt, 4),
            "hits": hits,
            "e2e_discover_seconds": round(e2e, 4),
            "e2e_ot_positions": n_ots,
            "flashfry_1000g_mm4_hg38_seconds": 65.09,
        },
    }))


if __name__ == "__main__":
    main()
