"""Energy / momentum diagnostics.

The reference has no conservation accounting at all (SURVEY.md section 5); the
rebuild adds it because the drift gate (BASELINE.md) is defined in terms of
total energy over 1k steps.  The pair potential consistent with the softened
force ``a_i += m_j r_ij / (|r|^2 + eps2)^{3/2}`` (``kernel.cu:9-29``) is the
Plummer-softened potential ``phi_ij = -m_i m_j / sqrt(|r|^2 + eps2)``.

Computed in float64 on host-side arrays by default (fp32 state is upcast), so
the diagnostic itself does not add noise to the drift measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def kinetic_energy(vel, mass) -> jax.Array:
    v2 = jnp.sum(vel * vel, axis=-1)
    return 0.5 * jnp.sum(mass * v2)


def potential_energy(pos, mass, eps2: float, chunk: int = 2048) -> jax.Array:
    """-1/2 sum_{i != j} m_i m_j / sqrt(|r_ij|^2 + eps2), chunked over i."""
    n = pos.shape[0]
    chunk = min(chunk, n)
    n_pad = -(-n // chunk) * chunk
    pad = n_pad - n
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    mass_p = jnp.pad(mass, (0, pad))

    j_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    def body(carry, args):
        pos_c, mass_c, start = args
        r = pos_p[None, :, :] - pos_c[:, None, :]
        d2 = jnp.sum(r * r, axis=-1) + eps2
        inv = jax.lax.rsqrt(d2)
        # Mask the self-pair in place: its value m_i^2 * rsqrt(eps2) is
        # ~1000x the physical pair terms, so subtracting it after
        # accumulation would cancel catastrophically in fp32.
        i_ids = start + jax.lax.broadcasted_iota(
            jnp.int32, (pos_c.shape[0], 1), 0)
        inv = jnp.where(j_ids == i_ids, 0.0, inv)
        pe_c = jnp.sum(mass_c[:, None] * mass_p[None, :] * inv)
        return carry + pe_c, None

    starts = jnp.arange(0, n_pad, chunk, dtype=jnp.int32)
    chunks = (pos_p.reshape(-1, chunk, 3), mass_p.reshape(-1, chunk), starts)
    total, _ = jax.lax.scan(body, jnp.asarray(0.0, pos.dtype), chunks)
    return -0.5 * total


def total_energy(state, eps2: float) -> jax.Array:
    return kinetic_energy(state.vel, state.mass) + potential_energy(
        state.pos, state.mass, eps2)


def total_momentum(vel, mass) -> jax.Array:
    return jnp.sum(mass[:, None] * vel, axis=0)


@functools.partial(jax.jit, static_argnames=("eps2", "col_chunk"))
def _pe_rows(pos_rows, mass_rows, pos_all, mass_all, start, eps2,
             col_chunk=2048):
    """Device-side partial potential: the PE terms of ``pos_rows`` against
    ALL bodies, column-chunked (temporaries bounded to (rows, col_chunk)).
    Self-pairs masked by global index; zero-mass ghosts are inert."""
    n = pos_all.shape[0]
    i_ids = start + jax.lax.broadcasted_iota(
        jnp.int32, (pos_rows.shape[0], 1), 0)

    def body(carry, args):
        pos_c, mass_c, cstart = args
        r = pos_c[None, :, :] - pos_rows[:, None, :]
        d2 = jnp.sum(r * r, axis=-1) + eps2
        inv = jax.lax.rsqrt(d2)
        j_ids = cstart + jax.lax.broadcasted_iota(
            jnp.int32, (1, pos_c.shape[0]), 1)
        inv = jnp.where(j_ids == i_ids, 0.0, inv)
        return carry + jnp.sum(mass_rows[:, None] * mass_c[None, :] * inv), \
            None

    cstarts = jnp.arange(0, n, col_chunk, dtype=jnp.int32)
    cols = (pos_all.reshape(-1, col_chunk, 3),
            mass_all.reshape(-1, col_chunk), cstarts)
    total, _ = jax.lax.scan(body, jnp.asarray(0.0, pos_all.dtype), cols)
    return total


def total_energy_bounded(state, eps2: float,
                         row_chunk: "int | None" = None,
                         col_chunk: int = 2048,
                         max_prog_pairs: float = 3e11,
                         use_pallas: "bool | None" = None) -> float:
    """Total energy via BOUNDED device programs (one per ``row_chunk`` of
    bodies), partials accumulated in float64 on host.

    The huge-N companion of ``energy_f64``: the host-f64 path is O(N^2) on
    one CPU core (hours past ~256k bodies), and a single device program
    over all pairs exceeds execution-time-limited runtimes at N>=4M — the
    same wall ``run_steps_multiprog`` solves for forces.  Pairwise math is
    device float32 (adequate for drift diagnostics; each program's sum is
    an fp32 tree reduction, partials then combine in f64).

    ``row_chunk=None`` sizes rows so each program evaluates at most
    ``max_prog_pairs`` (rows x N) pairs — the per-program bound must not
    grow with N (at a fixed row count a 16M-body program would be ~16x
    longer than the 1M one and re-cross the execution limit).

    ``use_pallas=None`` picks the VMEM-tiled pair-potential kernel
    (``ops/pe_pallas.py``, ~4x the XLA sweep's pairs/s) on TPU and the
    XLA path elsewhere.  The pallas path computes self-pairs (mask-free
    kernel) and subtracts their closed-form total ``sum(m^2)/sqrt(eps2)``
    afterwards — exact at r=0 where d2 == eps2."""
    import jax
    n = state.pos.shape[0]
    if row_chunk is None:
        row_chunk = max(1024, min(65536, int(max_prog_pairs // max(n, 1))))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    ke = float(kinetic_energy(state.vel, state.mass))
    pe = 0.0
    if use_pallas:
        from ..models.state import round_up
        from ..ops.pe_pallas import _pe_rows_padded
        block_i, block_u = 256, 2048
        # Pad + transpose the j-side ONCE (each op consuming the (N, 3)
        # array costs a 42.7x tiled copy — docs/PERF.md; per-row-chunk
        # repetition would multiply it ~N/row_chunk times).
        n_pad = round_up(n, block_u)
        posT = jnp.pad(state.pos, ((0, n_pad - n), (0, 0))).T
        mass_row = jnp.pad(state.mass, (0, n_pad - n))[None, :]
        interp = jax.default_backend() != "tpu"
        for s in range(0, n, row_chunk):
            rows = slice(s, min(s + row_chunk, n))
            nr = rows.stop - s
            nr_pad = round_up(nr, block_i)
            pos_r = jnp.pad(state.pos[rows], ((0, nr_pad - nr), (0, 0)))
            mass_r = jnp.pad(state.mass[rows], (0, nr_pad - nr))
            pe += float(_pe_rows_padded(pos_r, mass_r, posT, mass_row,
                                        float(eps2), block_i, block_u,
                                        interp))
        # Exact f64 self-term subtraction (the kernel is mask-free; the
        # self total is comparable to the pair sum, so the subtrahend
        # must not carry f32 rounding of its own).
        m64 = np.asarray(state.mass, dtype=np.float64)
        pe -= float(np.sum(m64 * m64)) / float(eps2) ** 0.5
    else:
        n_pad = -(-n // col_chunk) * col_chunk
        pos_all = jnp.pad(state.pos, ((0, n_pad - n), (0, 0)))
        mass_all = jnp.pad(state.mass, (0, n_pad - n))
        for s in range(0, n, row_chunk):
            rows = slice(s, min(s + row_chunk, n))
            pe += float(_pe_rows(state.pos[rows], state.mass[rows], pos_all,
                                 mass_all, s, float(eps2),
                                 col_chunk=col_chunk))
    return ke - 0.5 * pe


def energy_f64(state, eps2: float, max_host_n: int = 262144) -> float:
    """Float64 host-side total energy (the drift-gate measurement).

    Above ``max_host_n`` bodies the exact host-f64 sweep is infeasible
    (O(N^2) on one core); delegates to ``total_energy_bounded`` (device
    f32 pairs, f64 partial combination) — the precision that matters for
    the 1e-3-scale drift gates at those N."""
    if state.pos.shape[0] > max_host_n:
        return total_energy_bounded(state, eps2)
    pos = np.asarray(state.pos, dtype=np.float64)
    vel = np.asarray(state.vel, dtype=np.float64)
    mass = np.asarray(state.mass, dtype=np.float64)
    ke = 0.5 * float(np.sum(mass * np.sum(vel * vel, axis=-1)))
    pe = 0.0
    n = pos.shape[0]
    # Bound the (chunk, N, 3) float64 temporary to ~400 MB.
    chunk = max(1, min(n, 16 * 1024 * 1024 // max(n, 1) + 1))
    for s in range(0, n, chunk):
        pc = pos[s:s + chunk]
        mc = mass[s:s + chunk]
        r = pos[None, :, :] - pc[:, None, :]
        d2 = np.sum(r * r, axis=-1) + eps2
        inv = 1.0 / np.sqrt(d2)
        pe += float(np.sum(mc[:, None] * mass[None, :] * inv))
        pe -= float(np.sum(mc * mc)) / np.sqrt(eps2)
    return ke - 0.5 * pe
