"""Benchmark: honest end-to-end downsampling throughput.

Headline (config 1 scale, the reference's largest exercised workload —
``/root/reference/src/tests/coverage_tester.cpp:120-135``): **BAM -> BAM
wall time** on a real synthesized coordinate-sorted BAM of 1M read pairs
(2M reads), genome 30,000 bp, read length 150, max coverage 1000 — BAM
parse + pairing, pack, host->device transfer, device solve, selection
reconstruction, pairing, and the re-stream BAM write ALL inside the timed
window. No transfer or I/O cost is excluded (round-1 weakness #1).

vs_baseline: the same BAM -> BAM pipeline with this framework's exact C++
host greedy (``io/csrc/greedy.cpp``) doing the solve — the conservative
CPU yardstick (the reference publishes no numbers and its OR-Tools
min-cost-flow solvers are strictly slower than the greedy; BASELINE.md).

detail carries the per-phase split, a config-4 (E. coli scale: 16.7M
reads / 5 Mb / M=50) device-vs-host end-to-end comparison on the blocked
production kernel, and a roofline analysis of the sweep kernel (a VPU
dependency-chain workload: ns/position vs the latency floor; HBM bytes
per pass show bandwidth is NOT the bound — see ARCHITECTURE.md).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PAIRS = 1_000_000
GENOME = 30_000
READ_LEN = 150
M = 1000
SEED = 12345

ECOLI_READS = 16_700_000
ECOLI_GENOME = 5_000_000
ECOLI_M = 50

METRIC = "bam_to_bam_reads_per_s_2M_M1000"


def _fail_json(msg: str) -> str:
    return json.dumps(
        {
            "metric": METRIC,
            "value": 0,
            "unit": "reads/s",
            "vs_baseline": 0.0,
            "detail": {"error": msg},
        }
    )


def _orchestrate() -> None:
    """Run the measurement in child processes: the dev TPU relay stalls
    multi-MB transfers unpredictably, so try the TPU twice with a hard
    timeout, then fall back to the CPU backend (clearly labeled).

    Only a line with value > 0 counts as a result (round 2 shipped a 0
    because the watchdog's failure JSON was accepted as the answer);
    failure lines are kept solely as the last-resort output."""
    import subprocess

    last_fail = _fail_json("all bench attempts stalled (dev relay)")
    attempts = [([], 560), ([], 560), (["--cpu"], 700)]
    for extra, budget in attempts:
        try:
            proc = subprocess.run(
                [sys.executable, "-u", __file__, "--worker", *extra],
                capture_output=True,
                text=True,
                timeout=budget,
            )
        except subprocess.TimeoutExpired:
            continue
        for line in proc.stdout.splitlines():
            if not line.startswith("{"):
                continue
            try:
                value = json.loads(line).get("value", 0)
            except json.JSONDecodeError:
                continue
            if value and value > 0:
                print(line)
                return
            last_fail = line
    print(last_fail)


RESULT: dict | None = None  # best-so-far payload, printed if a later
# phase stalls: the headline must never regress to 0 because an optional
# detail phase (E. coli compare, roofline) hit a relay stall.


def _install_watchdog(seconds: int) -> None:
    """The dev TPU rides an HTTP relay that occasionally stalls transfers
    indefinitely; a stalled bench must emit its best-so-far result (or a
    failure line as last resort), not hang the driver."""
    import signal

    def fire(signum, frame):
        if RESULT is not None and RESULT.get("value"):
            RESULT.setdefault("detail", {})["note_watchdog"] = (
                "relay watchdog fired during an optional later phase; "
                "headline above was fully measured"
            )
            print(json.dumps(RESULT), flush=True)
            os._exit(0)
        print(_fail_json("device transfer stalled; relay watchdog fired"),
              flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def _nonce_pair(batch):
    """Append one random pair so no two bench runs present identical
    device inputs (the dev relay memoizes (program, inputs) -> result
    persistently, which would fake repeat timings)."""
    from genome_downsampler_tpu.core.readbatch import ReadBatch

    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    n = batch.ref_genome_length
    s = int(rng.integers(0, n - READ_LEN))
    return ReadBatch(
        bam_id=np.concatenate([batch.bam_id,
                               [batch.n_reads, batch.n_reads + 1]]),
        start=np.concatenate([batch.start, [s, min(s + 40, n - READ_LEN)]]),
        end=np.concatenate(
            [batch.end,
             [s + READ_LEN - 1, min(s + 40, n - READ_LEN) + READ_LEN - 1]]
        ),
        quality=np.concatenate([batch.quality, [60, 60]]),
        seq_length=np.concatenate([batch.seq_length, [READ_LEN, READ_LEN]]),
        is_first=np.concatenate([batch.is_first, [True, False]]),
        ref_genome_length=n,
    )


def _bam_to_bam(bam_path, out_path, solver, max_coverage, config):
    """The full CLI pipeline, timed per phase. Returns (total_s, phases)."""
    from genome_downsampler_tpu.io.bam import BamReader

    t0 = time.perf_counter()
    reader = BamReader(bam_path, config)
    batch = reader.get_batch()
    t1 = time.perf_counter()
    solution = np.asarray(solver.solve(max_coverage, batch), np.int64)
    t2 = time.perf_counter()
    paired = batch.find_pairs(solution)
    reader.write_paired_reads(out_path, paired)
    t3 = time.perf_counter()
    return t3 - t0, {
        "bam_read_s": round(t1 - t0, 3),
        "solve_s": round(t2 - t1, 3),
        "pair_write_s": round(t3 - t2, 3),
        "selected": int(len(paired)),
    }


def _ecoli_compare(use_device: bool):
    """Config-4 scale, in-memory (a 16.7M-record BAM synthesis is not
    feasible in the bench budget; the BAM I/O cost is identical for both
    paths anyway): device blocked pipeline (pack + transfer + solve +
    reconstruct) vs host C++ greedy, both end-to-end from the same arrays."""
    from genome_downsampler_tpu.solvers.blocked_sweep import (
        BlockedWindowedMcpSolver,
    )
    from genome_downsampler_tpu.solvers.native_greedy import (
        NativeGreedyMcpSolver,
    )
    from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform

    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    batch = rand_reads_uniform(
        rng, ECOLI_READS // 2, ECOLI_GENOME, READ_LEN
    )
    t0 = time.perf_counter()
    host_sel = NativeGreedyMcpSolver().solve(ECOLI_M, batch)
    t_host = time.perf_counter() - t0

    out = {"host_cpp_greedy_s": round(t_host, 2),
           "selected": int(len(host_sel))}
    if use_device:
        solver = BlockedWindowedMcpSolver()
        t0 = time.perf_counter()
        dev_sel = solver.solve(ECOLI_M, batch)
        t_dev = time.perf_counter() - t0
        assert len(dev_sel) == len(host_sel), (len(dev_sel), len(host_sel))
        out["device_blocked_e2e_s"] = round(t_dev, 2)
        out["device_vs_host"] = round(t_host / t_dev, 2)
    return out


def _roofline(batch, max_coverage):
    """Sweep-kernel roofline. The blocked sweep is a LATENCY-CHAIN
    workload: each genome position updates a (W, L) running window state
    that the next position depends on, so the floor is the VPU dependency
    chain, not FLOPs (MXU idle by design) and not HBM bandwidth.

    Reported: measured ns per position-step (W windows advance together),
    the HBM-bandwidth lower bound for the same pass (orders of magnitude
    below the measurement => not the bound), and the dependency-chain
    floor from the kernel's ~14 chained vector ops per step at ~5 cycles
    latency on a ~0.94 GHz VPU."""
    import jax
    import jax.numpy as jnp

    from genome_downsampler_tpu.ops.coverage import (
        capped_coverage,
        coverage_from_intervals,
    )
    from genome_downsampler_tpu.ops.pallas_blocked import (
        blocked_sweep_pass,
        pack_blocked,
    )

    W, BLOCK, L = 8, 256, 256
    n = batch.ref_genome_length
    packed, counts, win, n_pad = pack_blocked(
        np.asarray(batch.start, np.int64), np.asarray(batch.end, np.int64),
        n, W, BLOCK, L,
    )
    cov = coverage_from_intervals(
        jnp.asarray(np.asarray(batch.start)),
        jnp.asarray(np.asarray(batch.end)), n_pad,
    )
    target = np.asarray(capped_coverage(cov, max_coverage))
    tgt = jnp.asarray(target.reshape(W, win))
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    pk, ct = jnp.asarray(packed), jnp.asarray(counts)
    zero_a = jnp.zeros((W, L), jnp.int32)
    zero_s = jnp.zeros((W, L), jnp.int32)

    def run():
        sel, af, sf = blocked_sweep_pass(
            pk, ct, tgt, zero_a, zero_s, n_windows=W, block=BLOCK,
            max_span=L, interpret=interpret,
        )
        return sel

    sel = run()
    sel.block_until_ready()
    t0 = time.perf_counter()
    sel = run()
    sel.block_until_ready()
    dt = time.perf_counter() - t0
    steps = win  # positions per window; W windows advance in parallel
    ns_per_step = dt / steps * 1e9
    hbm_bytes = packed.nbytes + counts.nbytes + target.nbytes + n_pad * 4
    chain_ops, op_latency_cyc, clock_ghz = 14, 5, 0.94
    floor_ns = chain_ops * op_latency_cyc / clock_ghz
    return {
        "pass_s": round(dt, 4),
        "ns_per_position_step": round(ns_per_step, 1),
        "dependency_chain_floor_ns": round(floor_ns, 1),
        "x_above_latency_floor": round(ns_per_step / floor_ns, 1),
        "hbm_bytes_per_pass": int(hbm_bytes),
        "hbm_bound_s_at_800GBps": round(hbm_bytes / 8.1e11, 6),
        "note": "latency-chain workload: HBM floor is ~1000x below the "
                "measured pass; the gap to the dependency floor is the "
                "optimization headroom (W=16/32 packing, ROADMAP).",
    }


def main() -> None:
    _install_watchdog(520)
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
    from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver
    from genome_downsampler_tpu.testing.bam_writer import write_test_bam
    from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform

    backend = jax.devices()[0].platform

    # --- synthesize the config-1 BAM (nonce'd: see _nonce_pair) ----------
    rng = np.random.default_rng(SEED)
    batch = _nonce_pair(rand_reads_uniform(rng, PAIRS, GENOME, READ_LEN))
    bam_in = "/tmp/gd_bench_c1.bam"
    t0 = time.perf_counter()
    write_test_bam(bam_in, batch, coordinate_sorted=True, make_index=True)
    synth_s = time.perf_counter() - t0

    config = BamApiConfig(min_mapq=0, min_seq_length=0)

    # --- host baseline: BAM -> BAM with the exact C++ greedy -------------
    host_total, host_phases = _bam_to_bam(
        bam_in, "/tmp/gd_bench_host_out.bam",
        NativeGreedyMcpSolver(), M, config,
    )

    # --- device: BAM -> BAM with mcp-tpu (auto dense/blocked dispatch) ---
    dev_solver = McpDeviceSweepSolver()
    # one warm-up solve so the headline measures the pipeline, not XLA
    # compilation (a production service compiles once per shape)
    _ = dev_solver.solve(M, batch)
    dev_total, dev_phases = _bam_to_bam(
        bam_in, "/tmp/gd_bench_dev_out.bam", dev_solver, M, config,
    )
    assert dev_phases["selected"] == host_phases["selected"], (
        dev_phases, host_phases,
    )

    # Headline is measured: publish it as best-so-far BEFORE the optional
    # enrichment phases, so a relay stall there cannot zero the bench.
    global RESULT
    n_reads = batch.n_reads
    RESULT = {
        "metric": METRIC,
        "value": round(n_reads / dev_total),
        "unit": "reads/s",
        "vs_baseline": round(host_total / dev_total, 3),
        "detail": {
            "backend": backend,
            "device_bam_to_bam_s": round(dev_total, 3),
            "host_bam_to_bam_s": round(host_total, 3),
            "device_phases": dev_phases,
            "host_phases": host_phases,
            "bam_synth_s": round(synth_s, 1),
            "note": "headline includes BAM parse, pack, H2D "
                    "transfer, solve, reconstruct, pairing, and "
                    "the BAM re-stream write on both sides",
        },
    }

    # --- config 4 (E. coli scale) + kernel roofline (optional detail) ----
    on_tpu = backend in ("tpu", "axon")
    RESULT["detail"]["ecoli_16p7M_reads"] = _ecoli_compare(use_device=on_tpu)
    if on_tpu:
        # interpret-mode Pallas (CPU) takes minutes at this step count;
        # the roofline is a hardware statement, so only measure it there.
        RESULT["detail"]["sweep_kernel_roofline"] = _roofline(batch, M)

    import signal

    signal.alarm(0)
    print(json.dumps(RESULT))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        main()
    else:
        _orchestrate()
