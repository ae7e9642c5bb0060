"""Device benchmark for the blocked multi-window sweep (real TPU).

Usage:
  timeout 560 python -u scripts/bench_blocked.py sars     # 30 kb, 2M reads
  timeout 900 python -u scripts/bench_blocked.py ecoli    # 5 Mb, ~16M reads

Validates the selected-count optimum against the exact C++ host greedy and
prints wall times. The dev TPU rides an HTTP relay that can stall multi-MB
transfers; run under `timeout` and re-run on stall.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from genome_downsampler_tpu.ops.coverage import capped_coverage, coverage_from_intervals
from genome_downsampler_tpu.ops.pallas_blocked import (
    blocked_sweep_pass,
    blocked_windowed_sweep,
    pack_blocked,
)
from genome_downsampler_tpu.solvers.device_sweep import reconstruct_selection
from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver
from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform


def run(scale: str, n_windows: int = 8, block: int = 256, L: int = 256):
    if scale == "sars":
        pairs, n, read_len, m = 1_000_000, 30_000, 150, 1000
    elif scale == "ecoli":
        pairs, n, read_len, m = 8_350_000, 5_000_000, 150, 50
    elif scale == "ecoli-small":
        pairs, n, read_len, m = 2_000_000, 5_000_000, 150, 25
    else:
        raise SystemExit(f"unknown scale {scale}")

    rng = np.random.default_rng(12345)
    t0 = time.perf_counter()
    batch = rand_reads_uniform(rng, pairs, n, read_len)
    print(f"gen {batch.n_reads} reads: {time.perf_counter()-t0:.1f}s", flush=True)

    start = np.asarray(batch.start, np.int64)
    end = np.asarray(batch.end, np.int64)

    t0 = time.perf_counter()
    packed, counts, win, n_pad = pack_blocked(start, end, n, n_windows, block, L)
    print(
        f"pack: {time.perf_counter()-t0:.1f}s packed={packed.nbytes/1e6:.1f}MB "
        f"cap={packed.shape[2]} nbw={packed.shape[0]}",
        flush=True,
    )

    t0 = time.perf_counter()
    host_sel = NativeGreedyMcpSolver().solve(m, batch)
    host_t = time.perf_counter() - t0
    print(f"host C++ greedy: {host_t*1000:.0f}ms selected={len(host_sel)}", flush=True)

    t0 = time.perf_counter()
    packed_d = jnp.asarray(packed)
    counts_d = jnp.asarray(counts)
    s_dev = jnp.asarray(start.astype(np.int32))
    e_dev = jnp.asarray(end.astype(np.int32))
    ones = jnp.ones(start.shape[0], jnp.int32)
    cov = coverage_from_intervals(s_dev, e_dev, n_pad, ones)
    target = capped_coverage(cov, m).reshape(n_windows, win)
    target.block_until_ready()
    packed_d.block_until_ready()
    print(f"upload+target: {time.perf_counter()-t0:.1f}s", flush=True)

    # Honest timing under the axon relay: it memoizes (program, inputs) ->
    # result, so repeated identical calls return instantly. Each timed call
    # perturbs a PADDED sentinel slot of the packed codes with a fresh
    # negative value — any negative code has code // L < 0 and matches no
    # one-hot row, so the result is bit-identical while the input differs.
    import os as _os

    flat_counts = counts.reshape(-1)
    slack_g = int(np.argmin(flat_counts))
    assert flat_counts[slack_g] < packed.shape[2], "no padded slot available"
    nt, nw = slack_g // n_windows, slack_g % n_windows

    def nonce_packed():
        k = int.from_bytes(_os.urandom(4), "little") % 1_000_000
        return packed_d.at[nt, nw, packed.shape[2] - 1].set(-2 - k)

    zeros = jnp.zeros((n_windows, L), jnp.int32)
    t0 = time.perf_counter()
    sel1, a1, s1, _ = blocked_sweep_pass(
        packed_d, counts_d, target, zeros, zeros, n_windows, block, L
    )
    sel1.block_until_ready()
    print(f"pass 1 (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        pd = nonce_packed()
        int(jnp.sum(pd[0, 0, :1]))  # settle the perturbed input
        t0 = time.perf_counter()
        _, a1, s1, _ = blocked_sweep_pass(
            pd, counts_d, target, zeros, zeros, n_windows, block, L
        )
        int(jnp.sum(a1))  # force completion via scalar readback
        times.append(time.perf_counter() - t0)
    pass_t = min(times)
    print(f"pass (steady, nonce): {pass_t*1000:.0f}ms", flush=True)

    # full relaxed solve
    t0 = time.perf_counter()
    sel, rounds = blocked_windowed_sweep(
        packed_d, counts_d, target, n_windows, block, L
    )
    sel.block_until_ready()
    print(
        f"relaxed solve (compile+run): {time.perf_counter()-t0:.1f}s "
        f"rounds={int(rounds)}",
        flush=True,
    )
    times = []
    for _ in range(3):
        pd = nonce_packed()
        int(jnp.sum(pd[0, 0, :1]))
        t0 = time.perf_counter()
        sel, rounds = blocked_windowed_sweep(
            pd, counts_d, target, n_windows, block, L
        )
        int(jnp.sum(sel[:1]))
        times.append(time.perf_counter() - t0)
    solve_t = min(times)
    sel, rounds = blocked_windowed_sweep(
        packed_d, counts_d, target, n_windows, block, L
    )
    print(f"relaxed solve (steady, nonce): {solve_t*1000:.0f}ms rounds={int(rounds)}", flush=True)

    sel_np = np.asarray(sel)[:n]
    dev_sel = reconstruct_selection(start, end, sel_np)
    assert len(dev_sel) == len(host_sel), (len(dev_sel), len(host_sel))
    # validity
    cov_in = np.zeros(n + 1, np.int64)
    np.add.at(cov_in, start, 1)
    np.add.at(cov_in, end + 1, -1)
    cov_in = np.cumsum(cov_in)[:n]
    cov_out = np.zeros(n + 1, np.int64)
    np.add.at(cov_out, start[dev_sel], 1)
    np.add.at(cov_out, end[dev_sel] + 1, -1)
    cov_out = np.cumsum(cov_out)[:n]
    assert np.all(np.minimum(cov_in, m) <= cov_out)
    print(
        f"OK exact: device selected {len(dev_sel)} == host {len(host_sel)}; "
        f"{batch.n_reads/solve_t/1e6:.1f}M reads/s (solve only)",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    run(sys.argv[1] if len(sys.argv) > 1 else "sars")
