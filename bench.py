"""Benchmark: guide-vs-database comparison throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Workload (mirrors the reference paper's discover sweep, BASELINE.md):
  * synthetic hg38-scale genome (3000 Mbp, fixed seed) with an hg38-like
    REPEAT landscape (see synthesize_genome: ~5% repeat families incl.
    Alu-like high-copy ones, so per-guide OT counts span the real range and
    the 2000-position overflow cap trips) -> prefix-binned database
    (~360M distinct targets, ~12 GB of HBM code planes), cached under /tmp;
    falls back to a 400 Mbp genome when the hg38-scale cache is absent and
    BENCH_GENOME_MB=auto (building it takes ~10 min);
  * guides sampled BY GENOMIC POSITION (as the paper samples real genomic
    guides) — repeat-family guides appear at their genomic frequency;
  * discover scans at maxMismatch=3, 4 AND 5, guide batches 1/10/100/1000
    (the baseline table's two axes): stage-1 fused Pallas kernel (one-hot
    matmul on the MXU + threshold/reduce) + on-device compaction, ONE
    dispatch + ONE fetch per guide block;
  * END-TO-END rows: discover (scan+collect+positionOutput write) at
    mm=4/5, a 1-device-mesh ShardedScanner run (shard_map + Pallas — the
    composition a v5e-8 would execute), an HBM streaming-slab run, and the
    LIBRARY-DESIGN row (BASELINE config #5: 100k guides discover + score
    with per-phase seconds; BENCH_LIBRARY=0 to skip, LIB_GUIDES to resize).

Robustness (this sandbox shows 2-8x timing variance under load):
  * scan numbers are min-of-N (default 5) with every iteration logged;
  * warmup is stage-timed (jax init / codes upload+expand / compile) so an
    externally-loaded run is distinguishable from a slow kernel;
  * every scan asserts its hit count against a pinned expected count
    (first run pins it) AND a 2M-target slice is cross-checked against the
    exact numpy oracle, so a TPU-side correctness break fails the bench;
  * e2e rows pin the OVERFLOWED-guide count (must be > 0 at hg38 scale —
    the repeat genome makes the cap machinery do real work);
  * the library row pins the md5 of its scored output.

vs_baseline: the reference (FlashFry, single-threaded JVM) performs packed
XOR+popcount comparisons at ~2e8/s on the paper's EC2 hardware (its
BitEncoding.mismatches is ~4-5ns/comparison in a tight loop; see reference
bitcoding/BitEncoding.scala:127-132). vs_baseline = our comparisons/s / 2e8.
End-to-end anchors (BASELINE.md, hg38): discover 1000g mm=4 65.09 s, mm=5
108.54 s, mm=3 46.84 s; 1g mm=4 13.18 s; 10g 37.96 s; 100g 44.61 s; index
build: chr22 75 s (~75 min scaled to hg38).
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = "/tmp/flashfry_tpu_bench"
# v2: repeat-rich genome (hg38-like OT-count tail; the overflow cap trips)
DB_VERSION = "v2"
GENOME_MB_ENV = os.environ.get("BENCH_GENOME_MB", "auto")
N_GUIDES = int(os.environ.get("BENCH_GUIDES", "1000"))
SCAN_ITERS = int(os.environ.get("BENCH_ITERS", "5"))
LIB_GUIDES = int(os.environ.get("LIB_GUIDES", "100000"))
RUN_LIBRARY = os.environ.get("BENCH_LIBRARY", "1") == "1"
RUN_SHARDED = os.environ.get("BENCH_SHARDED", "1") == "1"
FLASHFRY_BASELINE_CMP_PER_S = 2.0e8
FLASHFRY_HG38_DISCOVER_S = {3: 46.84, 4: 65.09, 5: 108.54}  # 1000 guides
FLASHFRY_HG38_SMALL_S = {1: 13.18, 10: 37.96, 100: 44.61}   # mm=4
FLASHFRY_HG38_INDEX_S = 75.0 * (3000 / 50.0)  # chr22 75 s -> hg38 (README.md:43)
ORACLE_SLICE = 2_000_000  # targets cross-checked vs exact numpy per scan


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def resolve_genome_mb() -> int:
    if GENOME_MB_ENV != "auto":
        return int(GENOME_MB_ENV)
    if os.path.exists(os.path.join(CACHE, "bench_db_3000M_%s.npz" % DB_VERSION)):
        return 3000
    log("NOTE: hg38-scale (3000M) bench cache absent; falling back to 400M "
        "(set BENCH_GENOME_MB=3000 to build it, ~15 min)")
    return 400


def synthesize_genome(genome_mb: int, rng) -> np.ndarray:
    """Synthetic genome with an hg38-like repeat landscape (int8 codes).

    A uniform-random genome gives every guide ~135 mm<=4 off-targets and the
    2000-position overflow cap never trips; real hg38 is ~50% repetitive and
    FlashFry's 65/109 s baselines were paid against guides with thousands of
    OTs and live overflow (reference crispr/CRISPRSiteOT.scala:41-62). On a
    uniform base genome we overlay:

      * ~5% covered by repeat families — unit 300-5000 bp, copy number
        log-uniform 10-1000, every copy independently mutated at 1.5%/base,
        so sibling copies sit 0-5+ mismatches apart within any 23-mer window
        (SINE/LINE-like diverged families -> a heavy mm<=4 OT-count tail);
      * 3 high-copy "Alu-like" families — unit 300 bp, thousands of copies,
        20% of copies exact — guides landing in them see >2000 OT genomic
        positions (exact copies stack positions on one target, the database
        keeps up to 32767 per target) and OVERFLOW, exercising the cap
        machinery end-to-end.
    """
    n = genome_mb * 1_000_000
    genome = rng.integers(0, 4, size=n, dtype=np.int8)

    def place(unit: np.ndarray, copies: int, exact_frac: float) -> int:
        m = unit.shape[0]
        pos = rng.integers(0, n - m, size=copies)
        exact = rng.random(copies) < exact_frac
        for p, ex in zip(pos.tolist(), exact.tolist()):
            c = unit
            if not ex:
                c = unit.copy()
                nm = rng.binomial(m, 0.015)
                if nm:
                    s = rng.integers(0, m, size=nm)
                    c[s] = (c[s] + rng.integers(1, 4, size=nm)) % 4
            genome[p:p + m] = c
        return m * copies

    placed = 0
    for _ in range(3):
        unit = rng.integers(0, 4, size=300, dtype=np.int8)
        copies = max(2500, int(rng.integers(5000, 20001) * genome_mb / 3000))
        placed += place(unit, copies, 0.2)
    target = int(0.05 * n)
    while placed < target:
        m = int(rng.integers(300, 5001))
        copies = int(np.exp(rng.uniform(np.log(10), np.log(1000))))
        unit = rng.integers(0, 4, size=m, dtype=np.int8)
        placed += place(unit, copies, 0.0)
    log("repeat overlay: %.1f%% of genome placed as repeat copies"
        % (100.0 * placed / n))
    return genome


def get_database(genome_mb: int):
    from flashfry_tpu.database import (build_database_from_sites, load_database,
                                       save_database)
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.standards import Cas9NGGParameterPack

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "bench_db_%dM_%s.npz" % (genome_mb, DB_VERSION))
    if os.path.exists(path):
        log("loading cached bench database", path)
        return load_database(path)
    log("building %d Mbp synthetic genome (repeat-rich %s)..."
        % (genome_mb, DB_VERSION))
    rng = np.random.default_rng(2024)
    genome = synthesize_genome(genome_mb, rng)
    base_map = np.frombuffer(b"ACGT", dtype=np.uint8)
    # bytes, not str: find_target_sites accepts bytes-like contigs, so the
    # 3 GB genome never round-trips through a Python str (saves ~35 s of
    # encode/decode copies at hg38 scale)
    genome_bytes = base_map[genome].tobytes()
    t0 = time.time()
    sites = find_target_sites(iter([("benchChr", genome_bytes)]), Cas9NGGParameterPack)
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
    meta = os.path.join(CACHE, "bench_db_%dM_%s.npz.meta.json"
                        % (genome_mb, DB_VERSION))
    if os.path.exists(meta):
        with open(meta) as fh:
            return json.load(fh)
    return None


def sample_guides(db, n_guides: int, rng) -> np.ndarray:
    """Sample guide sequences BY GENOMIC POSITION: a target is drawn with
    probability proportional to its genomic occurrence count, as the
    paper's sweep draws real genomic guides (run_timing_collection.py).
    Repeat-family guides therefore appear at their genomic frequency —
    including the heavy-OT-tail members that overflow the 2000-position
    cap. Returns n_guides DISTINCT target longs."""
    total = int(db.pos_offsets[-1])
    offs = np.asarray(db.pos_offsets)
    idx = np.zeros(0, dtype=np.int64)
    while idx.size < n_guides:
        ks = rng.integers(0, total, size=2 * n_guides)
        cand = np.searchsorted(offs, ks, side="right") - 1
        idx = np.unique(np.concatenate([idx, cand]))
    # unique() sorts; shuffle deterministically then trim so the selection
    # is not biased toward low target indices
    rng.shuffle(idx)
    return db.targets[np.sort(idx[:n_guides])]


def collect_hits(scanner, guide_longs, max_mm):
    """Run one full scan; returns (t_idx, g_idx, mm) concatenated arrays."""
    ts, gs, ms = [], [], []
    for t, g, m in scanner.scan(guide_longs, max_mm):
        ts.append(np.asarray(t)); gs.append(np.asarray(g)); ms.append(np.asarray(m))
    if not ts:
        z = np.zeros(0, np.int64)
        return z, z, z.astype(np.int8)
    return np.concatenate(ts), np.concatenate(gs), np.concatenate(ms)


def _pin_path(genome_mb, name):
    return os.path.join(CACHE, "%s_%s_%dM_g%d.json"
                        % (name, DB_VERSION, genome_mb, N_GUIDES))


def presize_caps(scanner, genome_mb, detail):
    """Pre-escalate the scanner's triplet cap to the pinned hit counts from
    earlier runs, so the official run dispatches straight at the cap that
    will succeed instead of paying the escalation chain (each escalated cap
    is a fresh executable; compiles are persistent-cached but a cold cache
    costs minutes per shape on this 2-core host). trip_cap bounds triplets
    PER GUIDE-BLOCK dispatch (block size mirrors DeviceScanner.scan:
    128..max_guide_block() guides), so the pinned GLOBAL count is scaled to a
    per-block share (x4 safety margin for skew) when the guide set spans
    multiple blocks — a global-count presize would over-provision every
    in-flight fetch buffer. The caps actually used are recorded in the
    bench detail."""
    from flashfry_tpu.ops.scan import max_guide_block
    block = 128
    max_block = max_guide_block()
    while block < N_GUIDES and block < max_block:  # mirrors DeviceScanner
        block *= 2
    n_blocks = max(1, -(-N_GUIDES // block))
    for mm in (3, 4, 5):
        path = _pin_path(genome_mb, "expected_hits_mm%d" % mm)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            want = json.load(fh)["v"]
        per_block = want if n_blocks == 1 else (want // n_blocks) * 4
        cap, trip = scanner._caps.get(mm, (scanner._cap0, scanner._trip0))
        while trip < per_block:
            trip *= 4
        if trip != scanner._trip0:
            scanner._caps[mm] = (cap, trip)
            log("presized mm=%d trip_cap to %d (pinned hits %d)"
                % (mm, trip, want))
    detail["presized_caps"] = {
        str(mm): list(v) for mm, v in sorted(scanner._caps.items())}


def assert_pinned(genome_mb, name, value):
    """Pin a scalar on first run; fail the bench on any later divergence
    (a TPU-side correctness break must not post a number)."""
    path = _pin_path(genome_mb, name)
    if os.path.exists(path):
        with open(path) as fh:
            want = json.load(fh)["v"]
        assert value == want, \
            "%s = %r != pinned %r (%s)" % (name, value, want, path)
        return "checked"
    with open(path, "w") as fh:
        json.dump({"v": value}, fh)
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


def make_guides(db, guide_longs):
    """GuideWithOffTargets objects for a set of sampled target longs."""
    from flashfry_tpu.bitcoding import STRING_MASK
    from flashfry_tpu.targetio import GuideWithOffTargets
    enc = db.bit_encoding()
    seqs, _ = enc.decode_batch(np.asarray(guide_longs, dtype=np.uint64))
    guides = []
    for i, (g, s) in enumerate(zip(guide_longs, seqs)):
        gw = GuideWithOffTargets(
            "bench", i * 30, s, True, None,
            int(g & STRING_MASK | (np.uint64(1) << np.uint64(48))),
            overflow_cap=2000)
        guides.append(gw)
    return guides


def discover_e2e(db, scanner, guide_longs, max_mm, out_path):
    """Full discover epilogue: scan -> vectorized hit collection (overflow
    cap 2000) -> positionOutput TSV. The piece FlashFry's 65/109 s hg38
    wall-clock is spent on (modules/OffTargetDiscovery.scala:79-153).
    Returns (t_collect, t_write, n_ot_positions, n_overflowed)."""
    from flashfry_tpu.engine import _collect_hits
    from flashfry_tpu.targetio import write_output

    guides = make_guides(db, guide_longs)
    t0 = time.time()
    _collect_hits(db, guides, scanner.scan(
        np.asarray([g.long_encoding for g in guides], dtype=np.uint64), max_mm))
    t_collect = time.time()
    write_output(out_path, guides, db.bit_encoding(), db.bit_position(),
                 models=(), write_ots=True, write_positions=True)
    t_write = time.time()
    n_ots = sum(g.ot_count_total() for g in guides)
    n_over = sum(1 for g in guides if g.full)
    return t_collect - t0, t_write - t_collect, n_ots, n_over


def library_row(db, scanner, genome_mb, detail, platform):
    """BASELINE config #5: LIB_GUIDES-guide library discover + score with
    per-phase seconds (the reference paper's heaviest sweep point,
    run_timing_collection.py: 100k guides x mm=4 vs hg38). Phases: guide
    site-discovery, scan+collect, render+write, parse, each scoring model
    (CFD / Hsu / Jost / minot / dangerous), annotated write. Gated: pinned
    OT-position + overflowed-guide counts and the md5 of the scored file."""
    import argparse

    from flashfry_tpu.bitcoding import BitEncoding
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.engine import ScanStats, discover
    from flashfry_tpu.scoring import get_registered_scoring_metric
    from flashfry_tpu.targetio import parse_input, write_output
    from flashfry_tpu.utils import iterate_fasta

    d = {}
    rng = np.random.default_rng(11)
    lib_longs = sample_guides(db, LIB_GUIDES, rng)
    enc = db.bit_encoding()
    seqs, _ = enc.decode_batch(np.asarray(lib_longs, dtype=np.uint64))
    fasta = os.path.join(CACHE, "library_%d_%s.fasta" % (LIB_GUIDES, DB_VERSION))
    with open(fasta, "w") as fh:
        fh.write("".join(">g%d\n%s\n" % (i, s) for i, s in enumerate(seqs)))

    t0 = time.time()
    gsites = find_target_sites(iterate_fasta(fasta), db.pack,
                               capture_context=True)
    d["guide_site_discovery_s"] = round(time.time() - t0, 2)

    # presize the library scan's caps from the previous run's final values
    # (the escalation chain's intermediate executables cost ~7-20 s of
    # remote compile each; the pin makes the official run dispatch straight
    # at the caps that work)
    # the pin is keyed by the guide-block config: settled caps depend on
    # guides-per-block, and a shared pin would ratchet monotonically across
    # config changes (presize takes max(cur, pin), so settled >= pin — a
    # one-off escalated config could permanently inflate every later run's
    # stage-2 domain). Per-config pins keep each config at ITS settle point.
    from flashfry_tpu.ops.scan import max_guide_block
    caps_pin = _pin_path(genome_mb, "lib%d_caps_b%d"
                         % (LIB_GUIDES, max_guide_block()))
    if os.path.exists(caps_pin):
        with open(caps_pin) as fh:
            c = json.load(fh)["v"]
        cur = scanner._caps.get(4, (scanner._cap0, scanner._trip0))
        scanner._caps[4] = (max(cur[0], c[0]), max(cur[1], c[1]))
        log("presized library caps to %s" % (scanner._caps[4],))

    stats = ScanStats()
    t0 = time.time()
    guides = discover(db, gsites, max_mismatch=4, maximum_off_targets=2000,
                      backend="auto", stats=stats, scanner=scanner)
    # always record the settled caps: block-size/config changes can move
    # them, and a stale pin costs one escalation retry chain per run
    with open(caps_pin, "w") as fh:
        json.dump({"v": list(scanner._caps.get(
            4, (scanner._cap0, scanner._trip0)))}, fh)
    d["scan_collect_s"] = round(time.time() - t0, 2)
    d["collect_host_seconds"] = round(stats.collect_seconds, 2)
    d["pruned_counter_seconds"] = round(stats.counter_seconds, 2)
    n_ots = sum(g.ot_count_total() for g in guides)
    n_over = sum(1 for g in guides if g.full)
    d["ot_positions"] = n_ots
    d["overflowed_guides"] = n_over
    d["ot_positions_pin"] = assert_pinned(genome_mb, "lib%d_ots" % LIB_GUIDES,
                                          int(n_ots))
    assert_pinned(genome_mb, "lib%d_overflow" % LIB_GUIDES, int(n_over))

    out = os.path.join(CACHE, "library_%s.out" % DB_VERSION)
    t0 = time.time()
    write_output(out, guides, enc, db.bit_position(), models=(),
                 write_ots=True, write_positions=True)
    d["render_write_s"] = round(time.time() - t0, 2)
    d["tsv_mb"] = round(os.path.getsize(out) / 1e6, 1)
    del guides, gsites

    bit_enc = BitEncoding(db.pack)
    pos_enc = db.bit_position()
    t0 = time.time()
    parsed = parse_input(out, bit_enc, pos_enc, 2 ** 31 - 1,
                         filter_out_overflowed=True)
    sguides = parsed.guides
    d["parse_s"] = round(time.time() - t0, 2)
    d["scored_guides"] = len(sguides)

    models = []
    for name in ("doench2016cfd", "hsu2013", "jostandsantos", "minot",
                 "dangerous"):
        m = get_registered_scoring_metric(
            name, bit_enc, "", db.pack, -1, "", False, False, 1)
        m.bit_encoder(bit_enc)
        m.setup()
        m.attach_ot_scores = False
        t0 = time.time()
        m.score_guides(sguides, bit_enc, pos_enc, db.pack)
        d["score_%s_s" % name] = round(time.time() - t0, 2)
        models.append(m)
    from flashfry_tpu.scoring.base import clear_flat_cache
    clear_flat_cache()  # ~1 GB of memoized intermediates at 100k guides
    be = None
    from flashfry_tpu.scoring.otbatch import backend as score_backend
    be = score_backend()
    if be == "auto":
        from flashfry_tpu import native as ffnative
        be = "native" if ffnative.get_native() is not None else "numpy"
    d["score_backend"] = be

    # device-scoring certification on the real chip: the TPU descriptor
    # extraction (scoring/device.py) must reproduce the numpy oracle's
    # per-OT score columns BIT-exactly (integer work on device, exact f64
    # epilogue on host). Capped at 2M OTs to bound tunnel fetch time.
    if platform == "tpu" and sguides:
        from flashfry_tpu.scoring.base import flatten_guide_ots
        from flashfry_tpu.scoring.off_target import Doench2016CFDScore
        from flashfry_tpu.scoring.otbatch import OTScoreBatch
        flat, offsets = flatten_guide_ots(sguides)
        gidx = np.repeat(np.arange(len(sguides)), np.diff(offsets))
        glongs = np.fromiter((g.long_encoding for g in sguides),
                             np.uint64, len(sguides))
        cap = 2_000_000
        flat, gidx = flat[:cap], gidx[:cap]
        act = np.asarray(sorted(db.pack.comparison_mask_positions()),
                         np.int32)
        cfd = Doench2016CFDScore()
        cols = {}
        for b in ("device", "numpy"):
            sb = OTScoreBatch(flat, gidx, glongs, 23, act)
            sb._backend = b
            t0 = time.time()
            cols[b] = sb._column("cfd",
                                 cfd_tables=(cfd._mm_table, cfd._pam_table))
            d["score_cfd_%s_s" % b] = round(time.time() - t0, 3)
        assert (cols["device"][0].view(np.int64)
                == cols["numpy"][0].view(np.int64)).all() and \
               (cols["device"][1] == cols["numpy"][1]).all(), \
            "TPU descriptor scoring diverges from the numpy oracle"
        d["score_device_ots"] = int(flat.shape[0])
        d["score_device_match"] = "bit-identical"

    scored = os.path.join(CACHE, "library_%s.scored" % DB_VERSION)
    sguides = sorted(sguides, key=lambda g: g.start)
    t0 = time.time()
    write_output(scored, sguides, bit_enc, pos_enc, models,
                 write_ots=False, write_positions=True)
    d["write_scored_s"] = round(time.time() - t0, 2)
    md5 = hashlib.md5(open(scored, "rb").read()).hexdigest()
    d["scored_md5"] = md5
    d["scored_md5_pin"] = assert_pinned(genome_mb, "lib%d_md5" % LIB_GUIDES,
                                        md5)
    phases = [v for k, v in d.items() if k.endswith("_s")]
    d["total_s"] = round(sum(phases), 2)

    # ---- full 11-metric sweep (VERDICT r4 #8) ------------------------------
    # the remaining registered models (ScoreResults.scala:159-226), timed at
    # library scale on top of the 5 core metrics above. The 5-metric scored
    # file keeps its round-over-round md5 pin; the full-11 output pins its
    # own md5. doench2014ontarget/moreno2015 emit NA here (TSV input carries
    # no sequence context), exactly as the reference does on the same input.
    bed_path = os.path.join(CACHE, "library_annotation_%s.bed" % DB_VERSION)
    if not os.path.exists(bed_path):
        brng = np.random.default_rng(5)
        span = genome_mb * 1_000_000
        starts = np.sort(brng.integers(0, span, size=50_000))
        widths = brng.integers(100, 5_000, size=50_000)
        with open(bed_path, "w") as fh:
            for j in range(50_000):
                fh.write("benchChr\t%d\t%d\tI%d\n"
                         % (starts[j], starts[j] + widths[j], j))
    models_full = list(models)
    for name in ("doench2014ontarget", "moreno2015", "bedannotator",
                 "reciprocalofftargets", "folding", "rank"):
        m = get_registered_scoring_metric(
            name, bit_enc, "bench:" + bed_path, db.pack, -1, "", False,
            False, 1)
        # run_score_module call order: valid_over_enzyme also binds pack
        # (folding) — must NOT live inside an assert (python -O strips it)
        ok = m.valid_over_enzyme(db.pack)
        if not ok:
            raise RuntimeError("model %s invalid over bench enzyme" % name)
        m.bit_encoder(bit_enc)
        m.setup()
        m.attach_ot_scores = False
        if m.is_aggregate:
            m.initialize_score_names(
                [x for x in models_full if x.high_score_is_good is not None])
        t0 = time.time()
        m.score_guides(sguides, bit_enc, pos_enc, db.pack)
        d["score_%s_s" % name] = round(time.time() - t0, 2)
        models_full.append(m)
    scored11 = os.path.join(CACHE, "library_%s.scored11" % DB_VERSION)
    t0 = time.time()
    write_output(scored11, sguides, bit_enc, pos_enc, models_full,
                 write_ots=False, write_positions=True)
    d["write_scored11_s"] = round(time.time() - t0, 2)
    md5_11 = hashlib.md5(open(scored11, "rb").read()).hexdigest()
    d["scored11_md5"] = md5_11
    d["scored11_md5_pin"] = assert_pinned(
        genome_mb, "lib%d_full11_md5" % LIB_GUIDES, md5_11)
    d["total_full11_s"] = round(
        sum(v for k, v in d.items() if k.endswith("_s")
            and k != "total_s"), 2)
    detail["library"] = d
    log("library row:", json.dumps(d))


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
    guide_longs = sample_guides(db, N_GUIDES, rng)

    detail = {"genome_mb": genome_mb, "targets": n, "guides": N_GUIDES,
              "db_version": DB_VERSION}

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
    detail.update(scanner.init_timings)  # codes_upload_expand_s
    log("scanner init: %.1fs %s" % (time.time() - t0, scanner.init_timings))
    detail["backend"] = "pallas" if scanner.use_pallas else "jnp"
    log("scan backend:", detail["backend"])
    presize_caps(scanner, genome_mb, detail)

    t0 = time.time()
    t_idx, g_idx, mm4 = collect_hits(scanner, guide_longs, 4)
    t_first = time.time() - t0
    n_hits4 = t_idx.size
    detail["warmup_compile_first_scan_s"] = round(t_first, 1)
    log("compile + first scan: %.2fs, %d hits" % (t_first, n_hits4))

    # ---- correctness gates -------------------------------------------------
    detail["hits_mm4"] = int(n_hits4)
    detail["expected_hits_mm4"] = assert_pinned(genome_mb, "expected_hits_mm4",
                                                int(n_hits4))
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

    # mm=3 and mm=5 rows (BASELINE.md: 1000g mm=3 46.84 s, mm=5 108.54 s)
    for max_mm in (3, 5):
        t0 = time.time()
        t5, g5, mm5 = collect_hits(scanner, guide_longs, max_mm)
        t_first5 = time.time() - t0
        key = "_mm%d" % max_mm
        detail["hits" + key] = int(t5.size)
        detail["expected_hits" + key] = assert_pinned(
            genome_mb, "expected_hits_mm%d" % max_mm, int(t5.size))
        oracle_slice_check(db, guide_longs, max_mm, t5, g5, mm5)
        iters = []
        for _ in range(max(2, SCAN_ITERS - 2)):
            t0 = time.time()
            tt, _g, _m = collect_hits(scanner, guide_longs, max_mm)
            iters.append(time.time() - t0)
            assert tt.size == t5.size
        detail["seconds_per_scan" + key] = round(min(iters), 4)
        detail["scan_iters%s_s" % key] = [round(x, 4) for x in iters]
        log("scan mm=%d: first %.2fs, min %.3fs of %s"
            % (max_mm, t_first5, min(iters), detail["scan_iters%s_s" % key]))

    # ---- small-batch latency rows: 1/10/100 guides, mm=4 -------------------
    # (BASELINE.md rows: FlashFry 13.18 / 37.96 / 44.61 s) — shows the
    # fixed-cost floor of one fused dispatch
    for k in (1, 10, 100):
        sub = guide_longs[:k]
        runs = []
        for _ in range(3):
            t0 = time.time()
            tt, _g, _m = collect_hits(scanner, sub, 4)
            runs.append(time.time() - t0)
        detail["seconds_scan_%dg_mm4" % k] = round(min(runs), 4)
        if genome_mb >= 3000:
            detail["speedup_%dg_mm4_vs_flashfry" % k] = round(
                FLASHFRY_HG38_SMALL_S[k] / min(runs), 1)
        log("scan %dg mm=4: min %.3fs of %s" % (k, min(runs), runs))

    # ---- end-to-end discover (scan + collect + positionOutput write) -------
    # min-of-2 like the scans: a single run can absorb a multi-minute
    # device stall and misrepresent the steady-state number
    for max_mm, key in ((4, ""), (5, "_mm5")):
        runs = []
        for _ in range(2):
            t0 = time.time()
            t_sc, t_wr, n_ots, n_over = discover_e2e(
                db, scanner, guide_longs, max_mm,
                "/tmp/flashfry_tpu_bench_discover%s.out" % key)
            runs.append(time.time() - t0)
        e2e = min(runs)
        detail["e2e_discover_seconds%s" % key] = round(e2e, 3)
        detail["e2e_runs_s%s" % key] = [round(x, 3) for x in runs]
        detail["e2e_ot_positions%s" % key] = n_ots
        detail["e2e_overflowed_guides%s" % key] = n_over
        assert_pinned(genome_mb, "e2e_overflow_mm%d" % max_mm, int(n_over))
        if genome_mb >= 3000:
            assert n_over > 0, \
                "repeat genome must trip the overflow cap at hg38 scale"
            detail["e2e_speedup_vs_flashfry%s" % key] = round(
                FLASHFRY_HG38_DISCOVER_S[max_mm] / e2e, 1)
        log("discover e2e mm=%d: min %.3fs of %s (last: scan+collect %.3fs, "
            "render+write %.3fs, %d OT positions, %d overflowed guides)"
            % (max_mm, e2e, detail["e2e_runs_s%s" % key], t_sc, t_wr, n_ots,
               n_over))

    # ---- library design row (BASELINE config #5) ---------------------------
    if RUN_LIBRARY:
        library_row(db, scanner, genome_mb, detail, platform)

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

    # ---- sharded (shard_map + Pallas) on the real chip ---------------------
    # a 1-device mesh runs the EXACT composition a v5e-8 would execute
    # (parallel/mesh.py ShardedScanner with the stage-1 Pallas kernel);
    # asserts hit-count equality with the resident DeviceScanner
    if RUN_SHARDED and platform == "tpu":
        del scanner  # free the 12 GB resident planes before resharding
        import gc
        gc.collect()
        from jax.sharding import Mesh
        from flashfry_tpu.parallel.mesh import ShardedScanner
        t0 = time.time()
        mesh = Mesh(np.array(jax.devices("tpu")[:1]).reshape(1, 1),
                    ("db", "guides"))
        sh = ShardedScanner(db, mesh=mesh, use_pallas=True)
        while sh.trip_cap < n_hits4:  # presize: skip the escalation chain
            sh.trip_cap *= 4
        detail["sharded_1dev_init_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        ts, _gs, _ms = collect_hits(sh, guide_longs, 4)
        t_warm = time.time() - t0
        assert ts.size == n_hits4, \
            "sharded scan hit count %d != resident %d" % (ts.size, n_hits4)
        runs = []
        for _ in range(2):
            t0 = time.time()
            ts, _gs, _ms = collect_hits(sh, guide_longs, 4)
            runs.append(time.time() - t0)
            assert ts.size == n_hits4
        detail["sharded_1dev_scan_s"] = round(min(runs), 4)
        detail["sharded_1dev_backend"] = "pallas" if sh.use_pallas else "jnp"
        log("sharded 1-dev mesh scan: warm %.2fs, min %.3fs of %s "
            "(hit count matches resident)" % (t_warm, min(runs), runs))
        del sh

    # ---- index-phase record ------------------------------------------------
    meta = index_phase_seconds(genome_mb)
    if meta:
        detail["index_site_scan_s"] = meta.get("site_scan_s")
        detail["index_db_build_s"] = meta.get("db_build_s")
        if genome_mb >= 3000:
            # the reference ships no measured hg38 index time
            # (paper/timing_data has no index rows); the baseline here is a
            # LINEAR EXTRAPOLATION of the chr22 quickstart line
            # (README.md:43, 75 s for ~50 Mbp) and the key says so
            detail["index_speedup_vs_extrapolated_flashfry"] = round(
                FLASHFRY_HG38_INDEX_S /
                (meta["site_scan_s"] + meta["db_build_s"]), 1)
            detail["index_baseline_note"] = (
                "baseline extrapolated from chr22 README line; "
                "no measured reference hg38 index time exists")

    detail["flashfry_1000g_mm4_hg38_seconds"] = FLASHFRY_HG38_DISCOVER_S[4]
    detail["flashfry_1000g_mm5_hg38_seconds"] = FLASHFRY_HG38_DISCOVER_S[5]

    # ---- 2-host scaling model (BASELINE >=80% axis) ------------------------
    # hardware unavailable, so this is a MODEL with every input measured:
    # DCN bytes/block counted in a real 2-process jax.distributed run
    # (MultiHostScanner.dcn_allgather_bytes via tools/multihost_model.py,
    # round 5: 4.19 MB per 1024-guide block; trip-cap bound 8.39 MB), scan
    # seconds from THIS run, 50 Gbit/s DCN + 1 ms/slice. TWO regimes,
    # reported separately rather than blended:
    #  * pipelined multi-block (the library workloads that need 2 hosts):
    #    the 3-deep pipeline hides per-block dispatch/fetch latency, so the
    #    per-host cost is compute/2 + t_dcn -> eff = t1/(2*(t1/2+t_dcn));
    #  * single-block: the guide-count-independent dispatch+fetch floor
    #    (measured directly as this run's 1-guide scan) does NOT shrink
    #    when the db axis splits -> eff = t1/(2*(floor+(t1-floor)/2+t_dcn)).
    #    This regime is BELOW the 80% target and says so — latency-bound
    #    single scans are not what multi-host exists for.
    t1 = detail["seconds_per_scan"]
    floor = detail.get("seconds_scan_1g_mm4", 0.0)
    bw = 50e9 / 8
    model = {}
    for label, b in (("measured", 4_194_432), ("trip_cap_bound", 8_388_608)):
        t_dcn = b / bw + 2e-3
        model[label] = {
            "dcn_mb_per_block": round(b / 1e6, 2),
            "efficiency_2host_pipelined_pct": round(
                100 * t1 / (2 * (t1 / 2 + t_dcn)), 1),
            "efficiency_2host_single_block_pct": round(
                100 * t1 / (2 * (floor + (t1 - floor) / 2 + t_dcn)), 1)}
    model["inputs"] = ("dcn bytes measured in a 2-process run "
                      "(tools/multihost_model.py); block seconds and the "
                      "1-guide fixed floor from this run; 50 Gbit/s DCN + "
                      "1 ms/slice; pipelined = per-block latency hidden by "
                      "the 3-deep pipeline (multi-block workloads)")
    detail["multihost_2host_model"] = model

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
