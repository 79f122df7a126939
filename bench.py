"""Benchmark: guide-vs-database comparison throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Workload (mirrors the reference paper's discover sweep, BASELINE.md):
  * synthetic hg38-scale genome (3000 Mbp, fixed seed) -> prefix-binned
    database (375M distinct targets, ~12 GB of HBM code planes), cached
    under /tmp between runs; falls back to a 400 Mbp genome (50M targets)
    when the hg38-scale cache is absent and BENCH_GENOME_MB=auto (building
    it takes ~10 min; set BENCH_GENOME_MB=3000 to force);
  * 1000 candidate guides (sampled from the database, as the paper's
    run_timing_collection.py samples real genomic guides);
  * discover scan at maxMismatch=4 AND 5 (the two baseline rows): stage-1
    fused Pallas kernel (one-hot matmul on the MXU + threshold/reduce) +
    on-device compaction, ONE dispatch + ONE fetch per guide block.

Robustness (this sandbox shows 2-8x timing variance under load):
  * scan numbers are min-of-N (default 5) with every iteration logged;
  * warmup is stage-timed (jax init / plane-codes build / HBM upload /
    compile+first-scan) so an externally-loaded run is distinguishable
    from a slow kernel;
  * every scan asserts its hit count against a pinned expected count
    (first run pins it) AND a 2M-target slice is cross-checked against the
    exact numpy oracle, so a TPU-side correctness break fails the bench;
  * one run goes through the HBM streaming-slab path (lowered budget) and
    must reproduce the resident hit count.

vs_baseline: the reference (FlashFry, single-threaded JVM) performs packed
XOR+popcount comparisons at ~2e8/s on the paper's EC2 hardware (its
BitEncoding.mismatches is ~4-5ns/comparison in a tight loop; see reference
bitcoding/BitEncoding.scala:127-132). vs_baseline = our comparisons/s / 2e8.
End-to-end anchors (BASELINE.md, hg38, 1000 guides): discover mm=4 65.09 s,
mm=5 108.54 s; index build: chr22 75 s (~75 min scaled to hg38).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = "/tmp/flashfry_tpu_bench"
GENOME_MB_ENV = os.environ.get("BENCH_GENOME_MB", "auto")
N_GUIDES = int(os.environ.get("BENCH_GUIDES", "1000"))
SCAN_ITERS = int(os.environ.get("BENCH_ITERS", "5"))
FLASHFRY_BASELINE_CMP_PER_S = 2.0e8
FLASHFRY_HG38_DISCOVER_S = {4: 65.09, 5: 108.54}  # BASELINE.md, 1000 guides
FLASHFRY_HG38_INDEX_S = 75.0 * (3000 / 50.0)  # chr22 75 s -> hg38 ~4500 s (README.md:43)
ORACLE_SLICE = 2_000_000  # targets cross-checked vs exact numpy per scan


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def resolve_genome_mb() -> int:
    if GENOME_MB_ENV != "auto":
        return int(GENOME_MB_ENV)
    if os.path.exists(os.path.join(CACHE, "bench_db_3000M.npz")):
        return 3000
    log("NOTE: hg38-scale (3000M) bench cache absent; falling back to 400M "
        "(set BENCH_GENOME_MB=3000 to build it, ~10 min)")
    return 400


def get_database(genome_mb: int):
    from flashfry_tpu.database import (build_database_from_sites, load_database,
                                       save_database)
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.standards import Cas9NGGParameterPack

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "bench_db_%dM.npz" % genome_mb)
    if os.path.exists(path):
        log("loading cached bench database", path)
        return load_database(path)
    log("building %d Mbp synthetic genome..." % genome_mb)
    rng = np.random.default_rng(2024)
    n = genome_mb * 1_000_000
    genome = rng.integers(0, 4, size=n, dtype=np.int8)
    base_map = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome_str = bytes(base_map[genome]).decode("ascii")
    t0 = time.time()
    sites = find_target_sites(iter([("benchChr", genome_str)]), Cas9NGGParameterPack)
    t_scan = time.time() - t0
    log("site scan: %.1fs, %d sites" % (t_scan, len(sites)))
    t0 = time.time()
    db = build_database_from_sites(sites, 7)
    t_build = time.time() - t0
    log("db build: %.1fs, %d distinct targets" % (t_build, db.num_targets))
    save_database(db, path)
    with open(path + ".meta.json", "w") as fh:
        json.dump({"genome_mb": genome_mb, "site_scan_s": round(t_scan, 1),
                   "db_build_s": round(t_build, 1),
                   "num_targets": int(db.num_targets)}, fh)
    return db


def index_phase_seconds(genome_mb: int):
    """Index-phase timings recorded when the cache was built (site scan +
    sort/dedup/CSR build; reference: chr22 in 75 s, README.md:43)."""
    meta = os.path.join(CACHE, "bench_db_%dM.npz.meta.json" % genome_mb)
    if os.path.exists(meta):
        with open(meta) as fh:
            return json.load(fh)
    return None


def collect_hits(scanner, guide_longs, max_mm):
    """Run one full scan; returns (t_idx, g_idx, mm) concatenated arrays."""
    ts, gs, ms = [], [], []
    for t, g, m in scanner.scan(guide_longs, max_mm):
        ts.append(np.asarray(t)); gs.append(np.asarray(g)); ms.append(np.asarray(m))
    if not ts:
        z = np.zeros(0, np.int64)
        return z, z, z.astype(np.int8)
    return np.concatenate(ts), np.concatenate(gs), np.concatenate(ms)


def presize_caps(scanner, genome_mb):
    """Pre-escalate the scanner's triplet cap to the pinned hit counts from
    earlier runs, so the official run dispatches straight at the cap that
    will succeed instead of paying the escalation chain (each escalated cap
    is a fresh executable; compiles are persistent-cached but a cold cache
    costs minutes per shape on this 2-core host)."""
    for mm in (4, 5):
        path = os.path.join(CACHE, "expected_hits_%dM_g%d_mm%d.json"
                            % (genome_mb, N_GUIDES, mm))
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            want = json.load(fh)["hits"]
        cap, trip = scanner._caps.get(mm, (scanner._cap0, scanner._trip0))
        while trip < want:
            trip *= 4
        if trip != scanner._trip0:
            scanner._caps[mm] = (cap, trip)
            log("presized mm=%d trip_cap to %d (pinned hits %d)"
                % (mm, trip, want))


def assert_expected_hits(genome_mb, max_mm, n_hits):
    """Pin the scan's hit count on first run; fail the bench on any later
    divergence (a TPU-side correctness break must not post a number)."""
    path = os.path.join(CACHE, "expected_hits_%dM_g%d_mm%d.json"
                        % (genome_mb, N_GUIDES, max_mm))
    if os.path.exists(path):
        with open(path) as fh:
            want = json.load(fh)["hits"]
        assert n_hits == want, \
            "scan hit count %d != pinned %d (%s)" % (n_hits, want, path)
        return "checked"
    with open(path, "w") as fh:
        json.dump({"hits": int(n_hits)}, fh)
    return "pinned"


def oracle_slice_check(db, guide_longs, max_mm, t_idx, g_idx, mm):
    """Exact numpy oracle over a fixed 2M-target slice: the device scan's
    hits restricted to the slice must match exactly (ids and mm counts)."""
    from flashfry_tpu.bitcoding import BitEncoding
    n = db.num_targets
    lo = min(n // 2, max(0, n - ORACLE_SLICE))
    hi = min(n, lo + ORACLE_SLICE)
    enc = BitEncoding(db.pack)
    mm_o = enc.mismatches_cross(db.targets[lo:hi], guide_longs)  # (T, G)
    to, go = np.nonzero(mm_o <= max_mm)
    sel = (t_idx >= lo) & (t_idx < hi)
    got = np.stack([t_idx[sel] - lo, g_idx[sel], mm[sel].astype(np.int64)])
    want = np.stack([to, go, mm_o[to, go].astype(np.int64)])
    got = got[:, np.lexsort(got[::-1])]
    want = want[:, np.lexsort(want[::-1])]
    assert got.shape == want.shape and (got == want).all(), \
        "device scan diverges from numpy oracle on slice [%d, %d)" % (lo, hi)
    return int(to.size)


def discover_e2e(db, scanner, guide_longs, max_mm, out_path):
    """Full discover epilogue: scan -> vectorized hit collection (overflow
    cap 2000) -> positionOutput TSV. The piece FlashFry's 65/109 s hg38
    wall-clock is spent on (modules/OffTargetDiscovery.scala:79-153)."""
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
        np.asarray([g.long_encoding for g in guides], dtype=np.uint64), max_mm))
    t_collect = time.time()
    write_output(out_path, guides, enc, db.bit_position(),
                 models=(), write_ots=True, write_positions=True)
    t_write = time.time()
    n_ots = sum(g.ot_count_total() for g in guides)
    return t_collect - t0, t_write - t_collect, n_ots


def start_keepalive():
    """Dispatch + fetch a tiny op every few seconds for the rest of the run.

    The remote chip sporadically stalls a dispatch for minutes after the
    link sits idle (observed: a 476 s scan iteration and an 18-minute e2e
    stall, each following a long host-side phase, while identical
    neighboring iterations took 0.55 s). A heartbeat keeps the tunnel/claim
    warm; BENCH_KEEPALIVE=0 disables it."""
    if os.environ.get("BENCH_KEEPALIVE", "1") != "1":
        return
    import threading

    def beat():
        import jax.numpy as jnp
        x = jnp.float32(1)
        while True:
            try:
                np.asarray(x + 1)
            except Exception:
                return
            time.sleep(5)

    threading.Thread(target=beat, daemon=True, name="tpu-keepalive").start()


def main():
    genome_mb = resolve_genome_mb()
    db = get_database(genome_mb)
    from flashfry_tpu.ops.scan import DeviceScanner, default_platform

    n = db.num_targets
    rng = np.random.default_rng(7)
    guide_idx = rng.choice(n, size=N_GUIDES, replace=False)
    guide_longs = db.targets[guide_idx]

    detail = {"genome_mb": genome_mb, "targets": n, "guides": N_GUIDES}

    # ---- stage-timed warmup ------------------------------------------------
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    np.asarray(jnp.zeros((), jnp.float32) + 1)  # first dispatch: jax/axon init
    t_init = time.time() - t0
    platform = default_platform()
    log("platform: %s (init %.1fs)" % (platform, t_init))
    detail["platform"] = platform
    detail["warmup_jax_init_s"] = round(t_init, 1)
    start_keepalive()

    t0 = time.time()
    scanner = DeviceScanner(db, time_init=(platform == "tpu"))
    detail.update(scanner.init_timings)  # plane_codes_s, hbm_upload_s
    log("scanner init: %.1fs %s" % (time.time() - t0, scanner.init_timings))
    detail["backend"] = "pallas" if scanner.use_pallas else "jnp"
    log("scan backend:", detail["backend"])
    presize_caps(scanner, genome_mb)

    t0 = time.time()
    t_idx, g_idx, mm4 = collect_hits(scanner, guide_longs, 4)
    t_first = time.time() - t0
    n_hits4 = t_idx.size
    detail["warmup_compile_first_scan_s"] = round(t_first, 1)
    log("compile + first scan: %.2fs, %d hits" % (t_first, n_hits4))

    # ---- correctness gates -------------------------------------------------
    detail["hits_mm4"] = int(n_hits4)
    detail["expected_hits_mm4"] = assert_expected_hits(genome_mb, 4, n_hits4)
    t0 = time.time()
    n_slice = oracle_slice_check(db, guide_longs, 4, t_idx, g_idx, mm4)
    log("oracle slice check ok: %d hits in %d-target slice (%.1fs)"
        % (n_slice, ORACLE_SLICE, time.time() - t0))
    detail["oracle_slice_hits"] = n_slice

    # ---- measured scans: min of N ------------------------------------------
    iters4 = []
    for _ in range(SCAN_ITERS):
        t0 = time.time()
        tt, gg, _m = collect_hits(scanner, guide_longs, 4)
        iters4.append(time.time() - t0)
        assert tt.size == n_hits4
    dt = min(iters4)
    comparisons = N_GUIDES * n
    rate = comparisons / dt
    detail["seconds_per_scan"] = round(dt, 4)
    detail["scan_iters_s"] = [round(x, 4) for x in iters4]
    log("scan mm=4: min %.3fs of %s, %.3g cmp/s"
        % (dt, detail["scan_iters_s"], rate))

    # mm=5 row (BASELINE.md: FlashFry 1000g/mm=5 = 108.54 s)
    t0 = time.time()
    t5, g5, mm5 = collect_hits(scanner, guide_longs, 5)
    t_first5 = time.time() - t0
    detail["hits_mm5"] = int(t5.size)
    detail["expected_hits_mm5"] = assert_expected_hits(genome_mb, 5, t5.size)
    oracle_slice_check(db, guide_longs, 5, t5, g5, mm5)
    iters5 = []
    for _ in range(max(2, SCAN_ITERS - 2)):
        t0 = time.time()
        tt, _g, _m = collect_hits(scanner, guide_longs, 5)
        iters5.append(time.time() - t0)
        assert tt.size == t5.size
    detail["seconds_per_scan_mm5"] = round(min(iters5), 4)
    detail["scan_iters_mm5_s"] = [round(x, 4) for x in iters5]
    log("scan mm=5: first %.2fs, min %.3fs of %s"
        % (t_first5, min(iters5), detail["scan_iters_mm5_s"]))

    # ---- end-to-end discover (scan + collect + positionOutput write) -------
    # min-of-2 like the scans: a single run can absorb a multi-minute
    # device stall and misrepresent the steady-state number
    for max_mm, key in ((4, ""), (5, "_mm5")):
        runs = []
        for _ in range(2):
            t0 = time.time()
            t_sc, t_wr, n_ots = discover_e2e(
                db, scanner, guide_longs, max_mm,
                "/tmp/flashfry_tpu_bench_discover%s.out" % key)
            runs.append(time.time() - t0)
        e2e = min(runs)
        detail["e2e_discover_seconds%s" % key] = round(e2e, 3)
        detail["e2e_runs_s%s" % key] = [round(x, 3) for x in runs]
        detail["e2e_ot_positions%s" % key] = n_ots
        detail["e2e_speedup_vs_flashfry%s" % key] = round(
            FLASHFRY_HG38_DISCOVER_S[max_mm] / e2e, 1) if genome_mb >= 3000 else None
        log("discover e2e mm=%d: min %.3fs of %s (last: scan+collect %.3fs, "
            "render+write %.3fs, %d OT positions)"
            % (max_mm, e2e, detail["e2e_runs_s%s" % key], t_sc, t_wr, n_ots))

    # ---- HBM streaming-slab certification ----------------------------------
    from flashfry_tpu.ops.scan import CODE_ROWS
    slab_budget = (CODE_ROWS * n) // 2  # forces >= 3 slabs
    t0 = time.time()
    stream_scanner = DeviceScanner(db, hbm_budget=slab_budget)
    assert stream_scanner.codes is None, "budget did not trigger streaming"
    ts, _gs, _ms = collect_hits(stream_scanner, guide_longs, 4)
    t_stream = time.time() - t0
    assert ts.size == n_hits4, \
        "streaming scan hit count %d != resident %d" % (ts.size, n_hits4)
    detail["streaming_slab_scan_s"] = round(t_stream, 2)
    detail["streaming_slabs"] = int(np.ceil(stream_scanner.n / stream_scanner.slab_n))
    log("streaming-slab scan: %.1fs over %d slabs, hit count matches resident"
        % (t_stream, detail["streaming_slabs"]))
    del stream_scanner

    # ---- index-phase record ------------------------------------------------
    meta = index_phase_seconds(genome_mb)
    if meta:
        detail["index_site_scan_s"] = meta.get("site_scan_s")
        detail["index_db_build_s"] = meta.get("db_build_s")
        if genome_mb >= 3000:
            detail["index_speedup_vs_flashfry"] = round(
                FLASHFRY_HG38_INDEX_S /
                (meta["site_scan_s"] + meta["db_build_s"]), 1)

    detail["flashfry_1000g_mm4_hg38_seconds"] = FLASHFRY_HG38_DISCOVER_S[4]
    detail["flashfry_1000g_mm5_hg38_seconds"] = FLASHFRY_HG38_DISCOVER_S[5]

    print(json.dumps({
        "metric": "guide-vs-database comparisons/s/chip (%d guides, mm=4, "
                  "%dMbp genome)" % (N_GUIDES, genome_mb),
        "value": round(rate),
        "unit": "comparisons/s",
        "vs_baseline": round(rate / FLASHFRY_BASELINE_CMP_PER_S, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
