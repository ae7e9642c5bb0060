// Exact quality-weighted selection (QMCP) via cost-scaling min-cost flow.
//
// The production-scale exact solver for the reference's qmcp problem
// (arc cost max_quality - quality + 1,
// /root/reference/libs/qmcp-solver/src/qmcp_cpu_cost_scaling_solver.cpp):
// Goldberg-Tarjan epsilon-scaling push-relabel implemented from the
// published algorithm on the interval-flow network the SURVEY derives:
//
//   nodes 0..n on the genome line;
//   read arcs  start -> end+1, capacity 1, cost c_i;
//   chain arcs i+1 -> i, large capacity, cost 0;
//   node supplies -demand[i] from the capped-coverage difference
//   (mcp_cpu_cost_scaling_solver.cpp:59-66 semantics).
//
// Selected reads = unit arcs carrying flow. Deterministic: fixed arc order,
// FIFO active queue.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <vector>

namespace {

struct Graph {
    // paired arcs: arc a and a^1 are reverses of each other
    std::vector<int32_t> head;
    std::vector<int64_t> resid;  // residual capacity
    std::vector<int64_t> cost;   // scaled cost (reverse = -cost)
    std::vector<int32_t> next;   // forward-star linked list
    std::vector<int32_t> first;  // per node
    void init(int32_t n_nodes, size_t n_arcs_hint) {
        first.assign(n_nodes, -1);
        head.reserve(2 * n_arcs_hint);
        resid.reserve(2 * n_arcs_hint);
        cost.reserve(2 * n_arcs_hint);
        next.reserve(2 * n_arcs_hint);
    }
    int32_t add(int32_t u, int32_t v, int64_t cap, int64_t c) {
        int32_t a = (int32_t)head.size();
        head.push_back(v); resid.push_back(cap); cost.push_back(c);
        next.push_back(first[u]); first[u] = a;
        head.push_back(u); resid.push_back(0); cost.push_back(-c);
        next.push_back(first[v]); first[v] = a + 1;
        return a;
    }
};

}  // namespace

extern "C" {

// Returns selected count (>=0) with *out_sel = malloc'd ascending indices,
// or -1 on error. cost[] are per-read arc costs (int64, >= 0).
int64_t gd_qmcp_mcmf(
    const int64_t* start, const int64_t* end, const int64_t* cost_in,
    int64_t R, int64_t n, int64_t max_coverage, int64_t** out_sel) {
    *out_sel = nullptr;
    if (R == 0) {
        *out_sel = static_cast<int64_t*>(std::malloc(1));
        return 0;
    }
    for (int64_t i = 0; i < R; ++i)
        if (start[i] < 0 || end[i] >= n || end[i] < start[i]) return -1;

    const int32_t N = (int32_t)(n + 1);  // nodes 0..n

    // capped coverage -> demands d[0..n] (create_demand_function semantics)
    std::vector<int64_t> b(n + 2, 0);
    for (int64_t i = 0; i < R; ++i) { b[start[i] + 1]++; b[end[i] + 2]--; }
    for (int64_t j = 1; j <= n; ++j) b[j] += b[j - 1];  // b[j+1]=cov(j)... b is now prefix
    for (int64_t j = 0; j <= n; ++j) b[j] = std::min(b[j], max_coverage);
    std::vector<int64_t> supply(N, 0);  // supply = -demand
    // d[0] = -b[1]; d[i] = b[i]-b[i+1] (1<=i<=n-1); d[n] = b[n]
    supply[0] = b[1];
    for (int64_t i = 1; i < n; ++i) supply[i] = -(b[i] - b[i + 1]);
    supply[n] = -b[n];

    // scaled costs: multiply by N so that 1-optimality ends exact
    Graph g;
    g.init(N, (size_t)R + n);
    std::vector<int32_t> read_arc(R);
    int64_t max_c = 0;
    for (int64_t i = 0; i < R; ++i) max_c = std::max(max_c, cost_in[i]);
    for (int64_t i = 0; i < R; ++i)
        read_arc[i] = g.add((int32_t)start[i], (int32_t)(end[i] + 1), 1,
                            cost_in[i] * N);
    const int64_t chain_cap = (max_coverage > 0 ? 100 * max_coverage : 1) + R;
    for (int64_t i = 0; i < n; ++i)
        g.add((int32_t)(i + 1), (int32_t)i, chain_cap, 0);

    std::vector<int64_t> p(N, 0);       // prices
    std::vector<int64_t> excess(supply);
    std::vector<int32_t> cur(N);        // current-arc pointers

    int64_t eps = std::max<int64_t>(max_c * N, 1);
    const int64_t alpha = 8;

    auto rcost = [&](int32_t a, int32_t u) {
        return g.cost[a] + p[u] - p[g.head[a]];
    };

    while (true) {
        eps = std::max<int64_t>(eps / alpha, 1);
        // saturate arcs with negative reduced cost, zero the positive ones
        for (size_t a = 0; a < g.head.size(); a += 2) {
            int32_t u = g.head[a ^ 1], v = g.head[a];
            int64_t rc = g.cost[a] + p[u] - p[v];
            int64_t cap = g.resid[a] + g.resid[a ^ 1];
            if (rc < 0) {  // full flow
                excess[u] -= g.resid[a];
                excess[v] += g.resid[a];
                g.resid[a ^ 1] = cap; g.resid[a] = 0;
            } else if (rc > 0) {  // zero flow
                excess[v] -= g.resid[a ^ 1];
                excess[u] += g.resid[a ^ 1];
                g.resid[a] = cap; g.resid[a ^ 1] = 0;
            }
        }
        for (int32_t u = 0; u < N; ++u) cur[u] = g.first[u];
        std::deque<int32_t> active;
        std::vector<uint8_t> in_q(N, 0);
        for (int32_t u = 0; u < N; ++u)
            if (excess[u] > 0) { active.push_back(u); in_q[u] = 1; }

        while (!active.empty()) {
            int32_t u = active.front();
            active.pop_front();
            in_q[u] = 0;
            // discharge u
            while (excess[u] > 0) {
                int32_t a = cur[u];
                if (a == -1) {
                    // relabel: p[u] = max over residual arcs of
                    // (p[v] - cost(a) - eps)
                    int64_t best = INT64_MIN;
                    for (int32_t e = g.first[u]; e != -1; e = g.next[e])
                        if (g.resid[e] > 0)
                            best = std::max(best,
                                            p[g.head[e]] - g.cost[e] - eps);
                    if (best == INT64_MIN) {
                        // no residual arc: infeasible input
                        return -1;
                    }
                    p[u] = best;
                    cur[u] = g.first[u];
                    continue;
                }
                if (g.resid[a] > 0 && rcost(a, u) < 0) {
                    int64_t amt = std::min(excess[u], g.resid[a]);
                    g.resid[a] -= amt;
                    g.resid[a ^ 1] += amt;
                    excess[u] -= amt;
                    int32_t v = g.head[a];
                    excess[v] += amt;
                    if (excess[v] > 0 && !in_q[v]) {
                        active.push_back(v);
                        in_q[v] = 1;
                    }
                } else {
                    cur[u] = g.next[a];
                }
            }
        }
        if (eps == 1) break;
    }

    std::vector<int64_t> sel;
    sel.reserve(R / 4);
    for (int64_t i = 0; i < R; ++i)
        if (g.resid[read_arc[i]] == 0) sel.push_back(i);
    int64_t* out = static_cast<int64_t*>(
        std::malloc(sizeof(int64_t) * std::max<int64_t>((int64_t)sel.size(), 1)));
    std::memcpy(out, sel.data(), sel.size() * sizeof(int64_t));
    *out_sel = out;
    return (int64_t)sel.size();
}

}  // extern "C"
