"""W-scaling experiment: seeded carry relaxation at the headline scale.

Measures, per window count W, the blocked-kernel pass time, the seed
pre-pass cost, and the relaxation rounds actually used with and without
boundary-local seeding — the round-4 lever: if seeding pins rounds at ~2-3
regardless of W, wider W divides the sequential position count per pass.

Usage:
  timeout 900 python -u scripts/bench_w_scaling.py [reads_M] [W ...]
Defaults: 25M reads / 62.5 Mb / M=30 at W in {8, 16, 32}.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from genome_downsampler_tpu.ops.pallas_blocked import (
    blocked_sweep_pass,
    blocked_windowed_sweep,
    pack_blocked,
)
from genome_downsampler_tpu.solvers.blocked_sweep import _capped_target_host
from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver
from genome_downsampler_tpu.core.readbatch import ReadBatch


def gen_reads(n_reads: int, n: int, read_len: int, rng):
    start = rng.integers(0, n - read_len, n_reads, dtype=np.int64)
    start.sort(kind="stable")
    end = start + read_len - 1
    return start, end


def main():
    reads_m = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
    # args: W or W:B (e.g. "32:256")
    ws = [
        (int(a.split(":")[0]), int(a.split(":")[1]) if ":" in a else None)
        for a in sys.argv[2:]
    ] or [(8, None), (16, None), (32, None)]
    n_reads = int(reads_m * 1e6)
    cov = float(os.environ.get("GD_COV", 60))
    m = int(os.environ.get("GD_M", 30))
    n = int(n_reads * 150 / cov)
    read_len, block, L = 150, 256, 256

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    t0 = time.perf_counter()
    start, end = gen_reads(n_reads, n, read_len, rng)
    print(f"gen {n_reads} reads / {n/1e6:.1f} Mb: {time.perf_counter()-t0:.1f}s",
          flush=True)

    batch = ReadBatch(
        bam_id=np.arange(n_reads, dtype=np.int64),
        start=start, end=end,
        quality=np.full(n_reads, 60, np.int32),
        seq_length=np.full(n_reads, read_len, np.int32),
        is_first=np.tile([True, False], n_reads // 2 + 1)[:n_reads],
        ref_genome_length=n,
    )
    t0 = time.perf_counter()
    host_sel = NativeGreedyMcpSolver().solve(m, batch)
    print(f"host C++ greedy: {time.perf_counter()-t0:.1f}s "
          f"selected={len(host_sel)}", flush=True)
    t0 = time.perf_counter()
    host_sel = NativeGreedyMcpSolver().solve(m, batch)
    print(f"host C++ greedy (warm): {time.perf_counter()-t0:.1f}s", flush=True)

    for W, B_opt in ws:
        B = B_opt if B_opt else (block if W <= 16 else 128)
        capm = 256 if B >= 256 else 128
        t0 = time.perf_counter()
        packed, counts, win, n_pad = pack_blocked(
            start, end, n, W, B, L, cap_multiple=capm
        )
        pack_t = time.perf_counter() - t0
        nbw, _, cap = packed.shape
        static_chunks = nbw * W * 4 > 512 * 1024
        print(f"\nW={W} B={B}: pack {pack_t:.1f}s cap={cap} nbw={nbw} "
              f"packed={packed.nbytes/1e6:.0f}MB static_chunks={static_chunks}",
              flush=True)

        target32 = _capped_target_host(start, end, n_pad, m)
        t0 = time.perf_counter()
        # production transfer diet: uint16 codes + narrow target, widened
        # on device inside the jit (solvers/blocked_sweep._blocked_pipeline)
        assert B * L <= 1 << 16 and int(packed.max()) < 0xFFFF
        packed_u16 = jnp.asarray(packed.astype(np.uint16))
        counts_d = jnp.asarray(counts)
        target_i8 = jnp.asarray(target32.astype(np.int8))
        target_i8.block_until_ready()
        packed_u16.block_until_ready()
        print(f"  upload ({packed.size*2/1e6:.0f}+{n_pad/1e6:.0f}MB): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)

        @jax.jit
        def widen(pu16, ti8):
            p32 = pu16.astype(jnp.int32)
            p32 = jnp.where(p32 == 0xFFFF, jnp.int32(-1), p32)
            return p32, ti8.astype(jnp.int32).reshape(W, win)

        packed_d, target_d = widen(packed_u16, target_i8)
        packed_d.block_until_ready()

        flat_counts = counts.reshape(-1)
        slack_g = int(np.argmin(flat_counts))
        nt, nw = slack_g // W, slack_g % W

        def nonce_packed():
            k = int.from_bytes(os.urandom(4), "little") % 1_000_000
            return packed_d.at[nt, nw, cap - 1].set(-2 - k)

        zeros = jnp.zeros((W, L), jnp.int32)

        def one_pass(pd):
            _, a1, s1, _ = blocked_sweep_pass(
                pd, counts_d, target_d, zeros, zeros, W, B, L, chunk=capm,
                static_chunks=static_chunks,
            )
            return a1

        t0 = time.perf_counter()
        one_pass(packed_d).block_until_ready()
        print(f"  pass compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        times = []
        for _ in range(2):
            pd = nonce_packed()
            int(jnp.sum(pd[0, 0, :1]))
            t0 = time.perf_counter()
            int(jnp.sum(one_pass(pd)))
            times.append(time.perf_counter() - t0)
        pass_t = min(times)
        ns_step = pass_t / (win) * 1e9
        print(f"  pass steady: {pass_t*1000:.0f}ms = {ns_step:.0f} ns/step "
              f"({win} steps)", flush=True)

        seed_list = [int(x) for x in os.environ.get(
            "GD_SEEDS", "0,8").split(",")]
        for seed_blocks in seed_list:
            tag = f"seed{seed_blocks}"
            t0 = time.perf_counter()
            sel, rounds = blocked_windowed_sweep(
                packed_d, counts_d, target_d, W, B, L, chunk=capm,
                static_chunks=static_chunks, seed_blocks=seed_blocks,
            )
            sel.block_until_ready()
            print(f"  solve {tag} compile+run: {time.perf_counter()-t0:.1f}s "
                  f"rounds={int(rounds)}", flush=True)
            times = []
            for _ in range(2):
                pd = nonce_packed()
                int(jnp.sum(pd[0, 0, :1]))
                t0 = time.perf_counter()
                sel, rounds = blocked_windowed_sweep(
                    pd, counts_d, target_d, W, B, L, chunk=capm,
                    static_chunks=static_chunks, seed_blocks=seed_blocks,
                )
                int(jnp.sum(sel[:8]))
                times.append(time.perf_counter() - t0)
            n_sel = int(jnp.sum(sel))
            ok = n_sel == len(host_sel)
            print(f"  solve {tag} steady: {min(times)*1000:.0f}ms "
                  f"rounds={int(rounds)} selected={n_sel} exact={ok}",
                  flush=True)


if __name__ == "__main__":
    print("backend:", jax.devices()[0].platform, flush=True)
    main()
