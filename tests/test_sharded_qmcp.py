"""Sharded-mode safety + distributed exact QMCP.

Round-2 hardening of the multi-host path (VERDICT round 1):

- boundary pairs dropped by a region read are now REPORTED by the reader
  and a too-small halo fails loudly instead of silently diverging;
- the GRADE quality remap uses the allreduced global MAPQ range;
- qmcp (exact weighted, ``qmcp_cpu_cost_scaling_solver.cpp:44-49``
  objective) runs under ``--sharded`` with output bit-equal to a
  single-process run.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.io.bam import read_bam, read_bam_region
from genome_downsampler_tpu.parallel.sharded_io import run_sharded
from genome_downsampler_tpu.testing.bam_writer import write_test_bam

from tests.test_region_io import make_bounded_insert_batch

CFG = BamApiConfig(min_mapq=0, min_seq_length=0)


def test_region_read_reports_boundary_unmatched(tmp_path):
    batch = make_bounded_insert_batch(
        pairs=400, n=16_384, read_len=100, max_insert=600, seed=4
    )
    bam = tmp_path / "in.bam"
    write_test_bam(bam, batch, coordinate_sorted=True, make_index=True)

    cut = 8_000
    res = read_bam_region(bam, CFG, 0, cut)
    # every pair with exactly one mate's start in [0, cut] must be reported
    first = np.asarray(batch.start[0::2])
    second = np.asarray(batch.start[1::2])
    straddle = int(((first <= cut) ^ (second <= cut)).sum())
    assert straddle > 0, "fixture must produce boundary pairs"
    assert res.unmatched.shape[0] == straddle
    # the reported mate position lies outside the scanned region
    assert (res.unmatched[:, 2] > cut).all()
    # and the read itself was scanned
    assert (res.unmatched[:, 0] <= cut).all()


def test_region_read_no_unmatched_when_whole_file(tmp_path):
    batch = make_bounded_insert_batch(
        pairs=200, n=8_192, read_len=100, max_insert=400, seed=5
    )
    bam = tmp_path / "in.bam"
    write_test_bam(bam, batch, coordinate_sorted=True, make_index=True)
    res = read_bam_region(bam, CFG, 0, 8_192)
    assert res.unmatched.shape[0] == 0


def test_defer_grade_leaves_quality_raw(tmp_path):
    from genome_downsampler_tpu.config import AmpliconBehaviour

    batch = make_bounded_insert_batch(
        pairs=100, n=8_192, read_len=100, max_insert=300, seed=6
    )
    bam = tmp_path / "in.bam"
    write_test_bam(bam, batch, coordinate_sorted=True, make_index=True)
    bed = tmp_path / "amp.bed"
    bed.write_text(
        "ref1\t0\t120\tA1_LEFT\nref1\t3880\t4000\tA1_RIGHT\n"
    )
    tsv = tmp_path / "amp.tsv"
    tsv.write_text("A1_LEFT\tA1_RIGHT\n")
    cfg = BamApiConfig(
        min_mapq=0, min_seq_length=0,
        amplicon_behaviour=AmpliconBehaviour.GRADE,
        bed_path=bed, tsv_path=tsv,
    )
    raw = read_bam_region(bam, cfg, 0, 8_192, defer_grade=True)
    eager = read_bam_region(bam, cfg, 0, 8_192)
    assert raw.max_mapq_seen >= 0 and raw.min_mapq_seen <= raw.max_mapq_seen
    # eager = raw remapped with the region stats (bam_api.cpp:334-347)
    lo, hi = raw.min_mapq_seen, raw.max_mapq_seen
    want = (
        np.asarray(raw.batch.quality)
        - lo
        + np.where(raw.in_single, hi - lo, 0)
    )
    np.testing.assert_array_equal(np.asarray(eager.batch.quality), want)


def test_single_process_sharded_qmcp_matches_host_solver(tmp_path):
    """run_sharded(qmcp) in one process == NativeQmcpSolver on the full
    file (selection mapped to voffsets)."""
    from genome_downsampler_tpu.solvers.native_mcmf import NativeQmcpSolver

    batch = make_bounded_insert_batch(
        pairs=1500, n=16_384, read_len=100, max_insert=500, seed=7
    )
    bam = tmp_path / "in.bam"
    write_test_bam(bam, batch, coordinate_sorted=True, make_index=True)

    out = tmp_path / "out.bam"
    merged = run_sharded(
        bam, 4, CFG, out, halo=1024, max_span=128, algorithm="qmcp-cpu"
    )

    full, _, _ = read_bam(bam, CFG)
    sel = NativeQmcpSolver().solve(4, full)
    paired = full.find_pairs(sel)
    # full-file read ids are ordinals; re-read the region to get voffsets
    region = read_bam_region(bam, CFG, 0, 16_384)
    order_f = np.lexsort((full.is_first, full.start))
    order_r = np.lexsort((region.batch.is_first, region.batch.start))
    np.testing.assert_array_equal(
        full.start[order_f], region.batch.start[order_r]
    )
    voff_of_ordinal = np.empty(full.n_reads, np.int64)
    voff_of_ordinal[order_f] = np.asarray(
        region.batch.bam_id, np.int64
    )[order_r]
    want = np.unique(voff_of_ordinal[paired])
    np.testing.assert_array_equal(merged, want)


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["GD_REPO"])

    from genome_downsampler_tpu.config import BamApiConfig
    from genome_downsampler_tpu.parallel.launch import initialize_distributed
    from genome_downsampler_tpu.parallel.sharded_io import run_sharded

    initialize_distributed()
    assert jax.process_count() == 2
    cfg = BamApiConfig(min_mapq=0, min_seq_length=0)
    merged = run_sharded(
        os.environ["GD_BAM"], 4, cfg,
        os.environ["GD_OUT"] if jax.process_index() == 0 else None,
        halo=int(os.environ["GD_HALO"]), max_span=128,
        algorithm="qmcp-cpu",
    )
    from genome_downsampler_tpu.parallel import sharded_io as sio
    st = sio.LAST_QMCP_STATS
    frac = st["gathered_bytes"] / st["replicated_tuple_bytes_r3"]
    # VERDICT r4 done-criterion: per-rank remote-data footprint must stay
    # below 60% of the r3 replicated-tuple scheme even in the worst case
    assert frac < 0.6, st
    print(
        f"process {jax.process_index()} merged {len(merged)} OK "
        f"gather_frac={frac:.3f}",
        flush=True,
    )
    """
)


def _spawn_two(tmp_path, bam, out, halo):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        GD_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        GD_COORDINATOR=f"127.0.0.1:{port}",
        GD_NUM_PROCESSES="2",
        GD_BAM=str(bam),
        GD_OUT=str(out),
        GD_HALO=str(halo),
    )
    procs = []
    for rank in (0, 1):
        e = dict(env, GD_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)], env=e,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    return procs, outs


@pytest.mark.slow
def test_two_process_qmcp_bit_equal(tmp_path):
    batch = make_bounded_insert_batch(
        pairs=1500, n=16_384, read_len=100, max_insert=500, seed=12
    )
    bam = tmp_path / "in.bam"
    write_test_bam(bam, batch, coordinate_sorted=True, make_index=True)

    expected = tmp_path / "expected.bam"
    run_sharded(
        bam, 4, CFG, expected, halo=1024, max_span=128, algorithm="qmcp-cpu"
    )

    out = tmp_path / "out.bam"
    procs, outs = _spawn_two(tmp_path, bam, out, halo=1024)
    for rank, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{o[-3000:]}"
    assert out.read_bytes() == expected.read_bytes(), (
        "2-process qmcp output differs from the 1-process run"
    )


@pytest.mark.slow
def test_two_process_too_small_halo_fails_loudly(tmp_path):
    """max_insert 600 >> halo 256: boundary pairs are dropped and the run
    must ERROR, not silently diverge (round-1 weakness #3)."""
    batch = make_bounded_insert_batch(
        pairs=1500, n=16_384, read_len=100, max_insert=600, seed=13
    )
    bam = tmp_path / "in.bam"
    write_test_bam(bam, batch, coordinate_sorted=True, make_index=True)
    out = tmp_path / "out.bam"
    procs, outs = _spawn_two(tmp_path, bam, out, halo=256)
    combined = "\n".join(outs)
    assert any(p.returncode != 0 for p in procs), (
        f"too-small halo did not fail:\n{combined[-3000:]}"
    )
    assert "halo" in combined and "boundary" in combined


def test_truncation_objective_exact_on_ties():
    """ADVICE r4: when equal-cost ties span different buckets the MCMF
    optimum is non-unique, so pool truncation to min(count, M) guarantees
    the OBJECTIVE, not the read set. This adversarial fixture makes many
    overlapping buckets share one cost and asserts the truncated network's
    optimum cost (and coverage validity) equals the full-pool optimum."""
    from genome_downsampler_tpu.solvers.device_mcmf import (
        build_convex_buckets,
    )
    from genome_downsampler_tpu.solvers.native_mcmf import mcmf_flows_convex

    rng = np.random.default_rng(99)
    n, m = 2_000, 5
    r = 4_000
    start = rng.integers(0, n - 120, r)
    end = start + rng.integers(80, 120, r)
    cost = np.full(r, 7, np.int64)  # every read ties
    cost[rng.integers(0, r, 50)] = 3  # a few cheaper ones

    bs, be, off, pool, order, _first = build_convex_buckets(start, end, cost)
    cnts = np.diff(off)
    full = mcmf_flows_convex(bs, be, off, pool, n, m)

    keepn = np.minimum(cnts, m)
    rank_in = np.arange(len(pool), dtype=np.int64) - np.repeat(off[:-1], cnts)
    keep = rank_in < np.repeat(keepn, cnts)
    toff = np.zeros(len(bs) + 1, np.int64)
    np.cumsum(keepn, out=toff[1:])
    trunc = mcmf_flows_convex(bs, be, toff, pool[keep], n, m)

    def objective(flows, o):
        idx = np.arange(len(pool) if o is off else int(toff[-1]))
        rk = idx - np.repeat(o[:-1], np.diff(o))
        taken = rk < np.repeat(flows, np.diff(o))
        return int((pool if o is off else pool[keep])[taken].sum())

    assert objective(full, off) == objective(trunc, toff)

    # both selections meet the capped-coverage target per base
    def cov_of(flows):
        d = np.zeros(n + 1, np.int64)
        np.add.at(d, bs, flows)
        np.add.at(d, be + 1, -flows)
        return np.cumsum(d)[:n]

    d = np.zeros(n + 1, np.int64)
    np.add.at(d, bs, cnts)
    np.add.at(d, be + 1, -cnts)
    tgt = np.minimum(np.cumsum(d)[:n], m)
    assert (cov_of(full) >= tgt).all()
    assert (cov_of(trunc) >= tgt).all()
