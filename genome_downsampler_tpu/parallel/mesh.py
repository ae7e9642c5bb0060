"""Multi-chip genome-window sharding: shard_map over a 1-D device mesh.

The distributed form of ``parallel.windows``: one window per device along
mesh axis ``"x"``. Each relaxation round every device sweeps its window,
then ships its carry (two L-vectors) to the right neighbor over ICI via
``jax.lax.ppermute`` (edge devices receive zeros — exactly the genome-start
boundary condition). A ``psum``-reduced stability flag ends the loop; at the
fixed point the union result is bit-identical to the global sequential
greedy (see ``parallel.windows`` for the argument).

This is the framework's communication backend — the component the reference
lacks entirely (SURVEY.md section 5.8; its only transport is cudaMemcpy).
Collectives: 2 ppermute + 1 psum per round; boundary traffic is O(L) per
device pair, independent of genome and read count.

Sharding layout:
- ``rows``    int32[n, L] -> P("x", None)   read-start histogram, split by
                                            genome window (the "sequence"
                                            axis of this domain)
- ``target``  int32[n]    -> P("x")         capped coverage target
- ``sel``     int32[n]    -> P("x")         selected count per end position
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genome_downsampler_tpu.solvers.device_sweep import sweep_counts


def _window_relax_solve(
    rows_local: jax.Array,    # int32[win, L]
    target_local: jax.Array,  # int32[win]
    *,
    max_span: int,
    axis: str,
):
    """Per-device relaxation loop; runs inside shard_map."""
    L = max_span
    n_dev = jax.lax.axis_size(axis)
    right_perm = [(i, i + 1) for i in range(n_dev - 1)]

    zeros = jax.lax.pcast(jnp.zeros(L, jnp.int32), axis, to="varying")

    def sweep(a_in, s_in):
        return sweep_counts(rows_local, target_local, a_in, s_in, max_span)

    sel, a_out, s_out = sweep(zeros, zeros)

    def cond(state):
        k, a_in, s_in, sel, a_out, s_out = state
        a_next = jax.lax.ppermute(a_out, axis, right_perm)
        s_next = jax.lax.ppermute(s_out, axis, right_perm)
        local_stable = jnp.all(a_next == a_in) & jnp.all(s_next == s_in)
        all_stable = jax.lax.psum(
            (~local_stable).astype(jnp.int32), axis
        ) == 0
        return (~all_stable) & (k < n_dev)

    def body(state):
        k, _, _, _, a_out, s_out = state
        a_in = jax.lax.ppermute(a_out, axis, right_perm)
        s_in = jax.lax.ppermute(s_out, axis, right_perm)
        sel, a_out2, s_out2 = sweep(a_in, s_in)
        return (k + 1, a_in, s_in, sel, a_out2, s_out2)

    k, _, _, sel, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), zeros, zeros, sel, a_out, s_out)
    )
    return sel


def make_mesh_solver(
    mesh: Mesh, n: int, max_span: int, axis: str = "x"
) -> Tuple[callable, NamedSharding, NamedSharding]:
    """Build the jitted multi-device window solver for genome length ``n``
    (a multiple of the mesh size). Returns
    ``(fn, rows_sharding, target_sharding)``;
    ``fn(rows, target) -> sel_per_end (n,)`` sharded P("x")."""
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(f"genome length {n} must be padded to a multiple of {n_dev}")
    win = n // n_dev
    if win < max_span:
        raise ValueError(f"window {win} < max_span {max_span}")

    fn = jax.jit(
        jax.shard_map(
            functools.partial(_window_relax_solve, max_span=max_span, axis=axis),
            mesh=mesh,
            in_specs=(P(axis, None), P(axis)),
            out_specs=P(axis),
        )
    )
    return fn, NamedSharding(mesh, P(axis, None)), NamedSharding(mesh, P(axis))


def solve_on_mesh(
    mesh: Mesh,
    start: np.ndarray,
    end: np.ndarray,
    n: int,
    max_coverage: int,
    max_span: int = 256,
) -> np.ndarray:
    """End-to-end mesh solve returning the global per-end selection counts.

    Host-side convenience used by tests and the dry run; production batching
    would keep ``rows``/``target`` device-resident between solves.
    """
    n_dev = mesh.shape["x"]
    win = max(-(-n // n_dev), max_span)
    n_pad = win * n_dev

    rows_host = np.zeros((n_pad, max_span), np.int32)
    span = end - start + 1
    np.add.at(rows_host, (start, span - 1), 1)

    cov = np.zeros(n_pad + 1, np.int64)
    np.add.at(cov, start, 1)
    np.add.at(cov, np.clip(end + 1, 0, n_pad), -1)
    target_host = np.minimum(np.cumsum(cov)[:n_pad], max_coverage).astype(np.int32)

    fn, rows_sharding, target_sharding = make_mesh_solver(mesh, n_pad, max_span)
    rows = jax.device_put(jnp.asarray(rows_host), rows_sharding)
    target = jax.device_put(jnp.asarray(target_host), target_sharding)
    sel = fn(rows, target)
    return np.asarray(sel)
