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


def energy_f64(state, eps2: float) -> float:
    """Float64 host-side total energy (the drift-gate measurement)."""
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
