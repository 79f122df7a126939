// Native host-side kernels for flashfry_tpu.
//
// The TPU owns the mismatch scan; these routines cover the serial host work
// around it — genome site scanning, window packing and count merging — which
// the reference does with JVM regexes and sorts (ReferenceEncoder.scala,
// BlockReader.scala). Compiled on demand via g++ and loaded with ctypes
// (see flashfry_tpu/native.py).
//
// Base codes: A=0 C=1 G=2 T=3, 255 = invalid (N etc).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#include <parallel/algorithm>
#endif

namespace {

// does the window starting at i match any pattern? (codes validity handled
// separately by the caller loop)
inline bool window_matches(const uint8_t* codes, int64_t i,
                           int32_t n_pat,
                           const int32_t* pat_starts,
                           const int32_t* pat_offsets,
                           const uint8_t* pat_bases) {
    for (int32_t p = 0; p < n_pat; ++p) {
        bool ok = true;
        for (int32_t k = pat_starts[p]; k < pat_starts[p + 1]; ++k) {
            if (codes[i + pat_offsets[k]] != pat_bases[k]) { ok = false; break; }
        }
        if (ok) return true;
    }
    return false;
}

}  // namespace

extern "C" {

// Scan a contig's code array for scan-window matches.
//
// patterns: n_pat patterns, each with fixed-base constraints given as
//   (offset, base) pairs; pat_starts[p]..pat_starts[p+1] indexes into
//   pat_offsets/pat_bases. A window at i matches pattern p iff all fixed
//   bases match; additionally every base in [i, i+L) must be valid (<4).
// Returns the number of matches written to out (ascending, de-duplicated
// across patterns), or -1 if out_cap was too small.
int64_t ff_scan_sites(const uint8_t* codes, int64_t n, int32_t L,
                      int32_t n_pat,
                      const int32_t* pat_starts,
                      const int32_t* pat_offsets,
                      const uint8_t* pat_bases,
                      int64_t* out, int64_t out_cap) {
    if (n < L) return 0;
    const int64_t n_win = n - L + 1;

    int n_threads = 1;
#ifdef _OPENMP
    n_threads = omp_get_max_threads();
    if ((int64_t)n_threads * 65536 > n_win) n_threads = 1;
#endif

    std::vector<std::vector<int64_t>> hits(n_threads);
    const int64_t chunk = (n_win + n_threads - 1) / n_threads;

#ifdef _OPENMP
#pragma omp parallel for num_threads(n_threads) schedule(static, 1)
#endif
    for (int t = 0; t < n_threads; ++t) {
        const int64_t lo = (int64_t)t * chunk;
        const int64_t hi = lo + chunk < n_win ? lo + chunk : n_win;
        if (lo >= hi) continue;
        std::vector<int64_t>& mine = hits[t];
        mine.reserve((hi - lo) / 16 + 16);
        // running count of invalid bases in the current window
        int64_t invalid = 0;
        for (int64_t j = lo; j < lo + L - 1; ++j) invalid += (codes[j] >= 4);
        for (int64_t i = lo; i < hi; ++i) {
            invalid += (codes[i + L - 1] >= 4);
            if (invalid == 0 &&
                window_matches(codes, i, n_pat, pat_starts, pat_offsets, pat_bases))
                mine.push_back(i);
            invalid -= (codes[i] >= 4);
        }
    }

    int64_t count = 0;
    for (int t = 0; t < n_threads; ++t) count += (int64_t)hits[t].size();
    if (count > out_cap) return -1;
    int64_t w = 0;
    for (int t = 0; t < n_threads; ++t) {
        if (!hits[t].empty()) {
            std::memcpy(out + w, hits[t].data(), hits[t].size() * sizeof(int64_t));
            w += (int64_t)hits[t].size();
        }
    }
    return count;
}

// Pack L-base windows starting at `starts` into 2-bit uint64s
// (BitEncoding layout: first base in the highest occupied pair). If rc != 0,
// pack the reverse complement of each window.
void ff_pack_windows(const uint8_t* codes, const int64_t* starts,
                     int64_t n_starts, int32_t L, int32_t rc, uint64_t* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n_starts > 1 << 16)
#endif
    for (int64_t s = 0; s < n_starts; ++s) {
        const uint8_t* w = codes + starts[s];
        uint64_t enc = 0;
        if (rc) {
            for (int32_t j = L - 1; j >= 0; --j)
                enc = (enc << 2) | (uint64_t)(3 - w[j]);
        } else {
            for (int32_t j = 0; j < L; ++j)
                enc = (enc << 2) | (uint64_t)w[j];
        }
        out[s] = enc;
    }
}

// Merge runs of equal values in a sorted uint64 array.
// Writes unique values to uniq, run lengths to counts; returns #groups.
int64_t ff_group_sorted(const uint64_t* sorted, int64_t n,
                        uint64_t* uniq, int64_t* counts) {
    if (n == 0) return 0;
    int64_t g = 0;
    uniq[0] = sorted[0];
    counts[0] = 1;
    for (int64_t i = 1; i < n; ++i) {
        if (sorted[i] == sorted[i - 1]) {
            counts[g] += 1;
        } else {
            ++g;
            uniq[g] = sorted[i];
            counts[g] = 1;
        }
    }
    return g + 1;
}

// One-pass database construction: sort discovered sites into
// (bin, sequence, discovery-order) order, merge duplicate sequences with
// count saturation, pack genomic positions, and emit the columnar CSR
// layout (targets / positions / pos_offsets / bin_start) directly.
//
// Replaces numpy lexsort + grouping, whose large temporaries are slow on
// first-touch; semantics match database.build_database_from_sites exactly
// (reference: BlockReader.scala:87-135, DatabaseWriter.scala:58-111).
//
// seqs:   low-48-bit packed sequences (no count bits)
// bins:   prefix-bin index per site; must satisfy bins[i] < num_bins <= 2^16
// Position packing follows BitPosition.scala:51-62
// (strand<<60 | length<<52 | contig<<32 | position).
//
// Returns number of unique targets; n_positions_out[0] gets the total kept
// position count. Output capacities: targets/positions/pos_offsets need n
// (+1 for offsets) elements; bin_start needs num_bins+1.
int64_t ff_build_index(const uint64_t* seqs, const int64_t* bins,
                       const int64_t* contig_ids, const int64_t* positions,
                       const uint8_t* forward, int32_t target_length,
                       int64_t n, int64_t num_bins, int64_t max_pos,
                       uint64_t* targets_out, uint64_t* positions_out,
                       int64_t* pos_offsets_out, int64_t* bin_start_out,
                       int64_t* n_positions_out) {
    struct KeyIdx { uint64_t key; int64_t idx; };
    std::vector<KeyIdx> v(n);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n > 1 << 16)
#endif
    for (int64_t i = 0; i < n; ++i) {
        v[i].key = ((uint64_t)bins[i] << 48) | (seqs[i] & 0xFFFFFFFFFFFFULL);
        v[i].idx = i;
    }
    auto cmp = [](const KeyIdx& a, const KeyIdx& b) {
        return a.key != b.key ? a.key < b.key : a.idx < b.idx;
    };
#ifdef _OPENMP
    __gnu_parallel::sort(v.begin(), v.end(), cmp);
#else
    std::sort(v.begin(), v.end(), cmp);
#endif

    std::memset(bin_start_out, 0, sizeof(int64_t) * (num_bins + 1));
    int64_t nt = 0, np = 0;
    pos_offsets_out[0] = 0;
    int64_t i = 0;
    while (i < n) {
        const uint64_t key = v[i].key;
        int64_t j = i;
        while (j < n && v[j].key == key) ++j;
        const int64_t cnt = j - i;
        const int64_t kept = cnt < max_pos ? cnt : max_pos;
        targets_out[nt] = (key & 0xFFFFFFFFFFFFULL) | ((uint64_t)kept << 48);
        for (int64_t k = 0; k < kept; ++k) {
            const int64_t src = v[i + k].idx;
            positions_out[np++] =
                (forward[src] ? 0ULL : (1ULL << 60)) |
                ((uint64_t)target_length << 52) |
                ((uint64_t)contig_ids[src] << 32) |
                (uint64_t)positions[src];
        }
        pos_offsets_out[nt + 1] = np;
        bin_start_out[(key >> 48) + 1] += 1;
        ++nt;
        i = j;
    }
    for (int64_t b = 1; b <= num_bins; ++b) bin_start_out[b] += bin_start_out[b - 1];
    n_positions_out[0] = np;
    return nt;
}

}  // extern "C"
