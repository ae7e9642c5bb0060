"""chr1-scale single-chip demo: 250 Mb genome, 100M reads, all on device.

BASELINE.md config 5's shape (human chr1 ~250 Mb, 100M reads, coverage
60x -> 30x) on ONE chip. The dev relay cannot upload gigabyte inputs, so
reads come from a Weyl sequence (low-discrepancy uint32 arithmetic) that
host numpy reproduces bit-exactly for the C++ oracle — the device never
receives read data, only generates it:

  starts_i = ((i * 2654435761) mod 2^32) mod (n - read_len + 1)

Device pipeline (all jit):
  generate -> pack by (window, block) via sort + scatter -> capped-coverage
  target -> blocked multi-window sweep with carry relaxation
  (static_chunks: the 976k-group count table would overflow SMEM).

Validation: selected count equals the exact C++ host greedy on the
identical reads, and (fixed span) the selected coverage is checked >=
target at every base ON DEVICE via a windowed suffix sum.

Usage: timeout 1800 python -u scripts/bench_chr1.py [reads_millions]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from genome_downsampler_tpu.ops.pallas_blocked import blocked_windowed_sweep
from genome_downsampler_tpu.solvers.native_greedy import native_greedy_select

N = 250_000_000
READ_LEN = 150
M = 30
W, B, L, CAP = 8, 256, 256, 256
WEYL = np.uint32(2654435761)


def host_starts(r):
    i = np.arange(r, dtype=np.uint32)
    return ((i * WEYL) % np.uint32(N - READ_LEN + 1)).astype(np.int64)


def main():
    r = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 100_000_000
    global M
    if len(sys.argv) > 2:
        M = int(sys.argv[2])
    win = -(-(-(-N // W)) // B) * B
    nbw = win // B
    n_pad = W * win
    print(f"n={N} reads={r} win={win} nbw={nbw} n_pad={n_pad}", flush=True)

    # ---- host oracle (identical reads via the Weyl construction) ----
    t0 = time.perf_counter()
    s_host = host_starts(r)
    e_host = s_host + READ_LEN - 1
    print(f"host gen: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    oracle = native_greedy_select(s_host, e_host, N, M)
    oracle_count = len(oracle)
    print(
        f"host C++ greedy: {time.perf_counter()-t0:.1f}s "
        f"selected={oracle_count}",
        flush=True,
    )

    # ---- device: generate + pack + target (one jit) ----
    @jax.jit
    def build():
        i = jax.lax.iota(jnp.uint32, r)
        starts = (
            (i * WEYL) % jnp.uint32(N - READ_LEN + 1)
        ).astype(jnp.int32)
        code = (starts % B) * L + (READ_LEN - 1)
        group = ((starts % win) // B) * W + (starts // win)
        order = jnp.argsort(group)
        g_sorted = group[order]
        code_sorted = code[order]
        first = jnp.searchsorted(g_sorted, g_sorted, side="left")
        rank = jnp.arange(r, dtype=jnp.int32) - first.astype(jnp.int32)
        maxrank = jnp.max(rank)
        flat = g_sorted * CAP + rank
        packed = (
            jnp.full(nbw * W * CAP, -1, jnp.int32)
            .at[flat]
            .set(code_sorted)
            .reshape(nbw, W, CAP)
        )
        cov = (
            jnp.zeros(n_pad + 1, jnp.int32)
            .at[starts]
            .add(1)
            .at[starts + READ_LEN]
            .add(-1)
        )
        target = jnp.minimum(jnp.cumsum(cov)[:n_pad], M).reshape(W, win)
        return packed, target, maxrank

    t0 = time.perf_counter()
    packed, target, maxrank = build()
    maxrank = int(maxrank)
    print(
        f"device gen+pack+target: {time.perf_counter()-t0:.1f}s "
        f"max group fill={maxrank + 1} (cap {CAP})",
        flush=True,
    )
    assert maxrank < CAP, "bucket overflow: raise CAP"

    # ---- solve ----
    dummy_counts = jnp.zeros((nbw, W), jnp.int32)
    t0 = time.perf_counter()
    sel, rounds = blocked_windowed_sweep(
        packed, dummy_counts, target, W, B, L, CAP,
        interpret=False, static_chunks=True,
    )
    dev_count = int(jnp.sum(sel))
    solve_t = time.perf_counter() - t0
    print(
        f"device solve (compile+run): {solve_t:.1f}s rounds={int(rounds)} "
        f"selected={dev_count}",
        flush=True,
    )

    # ---- validate on device: fixed span => selected coverage at p is the
    # sum of sel_per_end over [p, p+READ_LEN-1] ----
    @jax.jit
    def valid(sel_flat, target_flat):
        cs = jnp.cumsum(sel_flat)
        upper = jnp.minimum(
            jnp.arange(n_pad) + READ_LEN - 1, n_pad - 1
        )
        win_sum = cs[upper] - jnp.where(
            jnp.arange(n_pad) > 0, cs[jnp.arange(n_pad) - 1], 0
        )
        return jnp.all(win_sum >= target_flat)

    ok = bool(valid(sel.reshape(-1), target.reshape(-1)))
    print(f"device validity (coverage >= target everywhere): {ok}", flush=True)
    assert ok
    assert dev_count == oracle_count, (dev_count, oracle_count)
    print(
        f"OK exact at chr1 scale: {dev_count} == host oracle; "
        f"{r/solve_t/1e6:.1f}M reads/s incl compile",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    main()
