// Exact unit-cost MCP greedy on host — the C-speed production CPU path.
//
// Same algorithm family as the device sweep (solvers/device_sweep.py): a
// left-to-right position sweep over end-offset count buckets, taking from
// the farthest slots first, followed by earliest-start-per-end-bucket
// identity reconstruction. Bit-compatible with the device solvers by
// construction (identical counts and tie-breaks), so it doubles as the
// large-scale oracle. Complexity O(n + R + total_selections) with counting
// sorts — no comparison sort, no heap.
//
// Replaces the role of OR-Tools SimpleMinCostFlow in the reference
// (/root/reference/libs/qmcp-solver/src/mcp_cpu_cost_scaling_solver.cpp)
// with a provably optimal combinatorial sweep (see greedy_mcp.py for the
// exchange-argument proof).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Selects an exact minimum-count subset meeting min(cov, M) per base.
// start/end: int64[R] inclusive; n: genome length; target_opt: optional
// int64[n] external per-base target (pass NULL to use min(cov, M)).
// out_sel: malloc'd ascending read indices (caller frees via gd_free_i64).
// Returns selected count, or -1 on error.
int64_t gd_greedy_mcp(
    const int64_t* start, const int64_t* end, int64_t R,
    int64_t n, int64_t max_coverage, const int64_t* target_opt,
    int64_t** out_sel) {
    *out_sel = nullptr;
    if (R == 0) {
        *out_sel = static_cast<int64_t*>(std::malloc(1));
        return 0;
    }
    int64_t max_span = 0;
    for (int64_t i = 0; i < R; ++i) {
        int64_t sp = end[i] - start[i] + 1;
        if (sp > max_span) max_span = sp;
        if (start[i] < 0 || end[i] >= n || sp <= 0) return -1;
    }
    const int64_t L = max_span;

    // target = min(coverage, M) via difference array, unless supplied
    std::vector<int64_t> target;
    const int64_t* tgt;
    if (target_opt) {
        tgt = target_opt;
    } else {
        std::vector<int64_t> diff(n + 1, 0);
        for (int64_t i = 0; i < R; ++i) {
            diff[start[i]]++;
            diff[end[i] + 1]--;
        }
        target.resize(n);
        int64_t run = 0;
        for (int64_t j = 0; j < n; ++j) {
            run += diff[j];
            target[j] = std::min(run, max_coverage);
        }
        tgt = target.data();
    }

    // reads bucketed by start via counting sort (stable -> index order kept)
    std::vector<int64_t> start_cnt(n + 1, 0);
    for (int64_t i = 0; i < R; ++i) start_cnt[start[i]]++;
    std::vector<int64_t> start_off(n + 1, 0);
    for (int64_t j = 1; j <= n; ++j) start_off[j] = start_off[j - 1] + start_cnt[j - 1];
    std::vector<int64_t> by_start(R);
    {
        std::vector<int64_t> cursor(start_off.begin(), start_off.end());
        for (int64_t i = 0; i < R; ++i) by_start[cursor[start[i]]++] = i;
    }

    // the sweep: ring buffers over end offsets (slot = end % L)
    std::vector<int64_t> avail(L, 0), selend(L, 0);
    std::vector<int64_t> sel_per_end(n, 0);
    int64_t cur = 0;  // selected reads covering the current position
    for (int64_t p = 0; p < n; ++p) {
        for (int64_t q = start_off[p]; q < start_off[p + 1]; ++q) {
            avail[end[by_start[q]] % L]++;
        }
        int64_t deficit = tgt[p] - cur;
        // take farthest-end first: ends in (p, p+L) descending, slot e % L
        for (int64_t e = p + L - 1; deficit > 0 && e >= p; --e) {
            int64_t slot = e % L;
            if (avail[slot] == 0) continue;
            int64_t take = std::min(avail[slot], deficit);
            avail[slot] -= take;
            selend[slot] += take;
            sel_per_end[e] += take;
            cur += take;
            deficit -= take;
        }
        // expire reads ending at p
        int64_t slot = p % L;
        cur -= selend[slot];
        selend[slot] = 0;
        avail[slot] = 0;
    }

    // reconstruction: per end bucket, earliest (start, index) first.
    // counting-sort by start (stable), then by end (stable) -> (end, start,
    // index) order without comparisons.
    std::vector<int64_t> end_cnt(n + 1, 0);
    for (int64_t i = 0; i < R; ++i) end_cnt[end[i]]++;
    std::vector<int64_t> end_off(n + 1, 0);
    for (int64_t j = 1; j <= n; ++j) end_off[j] = end_off[j - 1] + end_cnt[j - 1];
    std::vector<int64_t> by_end(R);
    {
        std::vector<int64_t> cursor(end_off.begin(), end_off.end());
        for (int64_t q = 0; q < R; ++q) {
            int64_t i = by_start[q];  // already start-then-index ordered
            by_end[cursor[end[i]]++] = i;
        }
    }
    std::vector<uint8_t> selected(R, 0);
    int64_t total = 0;
    for (int64_t e = 0; e < n; ++e) {
        int64_t quota = sel_per_end[e];
        for (int64_t q = end_off[e]; quota > 0; ++q, --quota) {
            selected[by_end[q]] = 1;
            total++;
        }
    }
    int64_t* out = static_cast<int64_t*>(std::malloc(sizeof(int64_t) * std::max<int64_t>(total, 1)));
    int64_t w = 0;
    for (int64_t i = 0; i < R; ++i)
        if (selected[i]) out[w++] = i;
    *out_sel = out;
    return total;
}

void gd_free_i64(int64_t* p) { std::free(p); }

}  // extern "C"
