"""Initial-condition generation.

Mirrors the reference's ``fill_with_random4`` / ``fill_with_zeroes*`` init
(``utils.cpp:9-37``): positions uniform per-axis in [-MAX_X, MAX_X], masses
uniform in [MIN_W, MAX_W], velocities and accelerations zero
(``main.cpp:254-272``).  The reference uses unseeded libc ``rand()`` (so it is
accidentally deterministic across runs, ``utils.cpp:6``); here determinism is
explicit via a JAX PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from .state import FlatState, SimState


def init_state(cfg: SimConfig, key: "jax.Array | None" = None) -> SimState:
    """Uniform random initial conditions matching utils.cpp:30-37 ranges."""
    if key is None:
        key = jax.random.key(cfg.seed)
    kpos, kmass = jax.random.split(key)
    dtype = cfg.jnp_dtype
    n = cfg.n_bodies
    pos = jax.random.uniform(
        kpos, (n, 3), dtype=jnp.float32,
        minval=-cfg.max_pos, maxval=cfg.max_pos).astype(dtype)
    mass = jax.random.uniform(
        kmass, (n,), dtype=jnp.float32,
        minval=cfg.min_mass, maxval=cfg.max_mass).astype(dtype)
    zeros = jnp.zeros((n, 3), dtype=dtype)
    return SimState(pos=pos, vel=zeros, acc=zeros, mass=mass)


def init_state_flat(cfg: SimConfig,
                    key: "jax.Array | None" = None) -> FlatState:
    """Uniform random initial conditions as a ``FlatState`` (row-major
    ``pos/vel/acc (3N,)``, ``mass (N,)``) — the >20M-body mode, where an
    ``(N, 3)`` array cannot exist on device (tiled-copy wall,
    docs/PERF.md; ``Simulation`` routes here automatically above
    ``ops.step.FLAT_AUTO_THRESHOLD`` bodies).

    Same uniform-box distribution as ``init_state`` (each coordinate
    i.i.d. uniform over ±max_pos), but NOT bit-identical per seed — the
    PRNG consumes the flat shape directly so the (N, 3) sample never
    materializes."""
    if cfg.dtype != "float32":
        # Flat mode drives the float32-only pallas_sym* kernels; refuse
        # rather than silently ignoring the configured precision.
        raise ValueError(
            f"flat-state mode is float32-only (pallas kernels); got "
            f"dtype={cfg.dtype!r}")
    if key is None:
        key = jax.random.key(cfg.seed)
    kpos, kmass = jax.random.split(key)
    n = cfg.n_bodies
    pos = jax.random.uniform(
        kpos, (3 * n,), dtype=jnp.float32,
        minval=-cfg.max_pos, maxval=cfg.max_pos)
    mass = jax.random.uniform(
        kmass, (n,), dtype=jnp.float32,
        minval=cfg.min_mass, maxval=cfg.max_mass)
    zeros = jnp.zeros((3 * n,), dtype=jnp.float32)
    return FlatState(pos=pos, vel=zeros, acc=zeros, mass=mass)


def plummer_state(cfg: SimConfig, key: "jax.Array | None" = None,
                  scale_radius: "float | None" = None) -> SimState:
    """Plummer-sphere initial conditions — a physically structured alternative
    to the reference's uniform box (goes beyond the reference; useful for
    energy-conservation studies where the uniform box collapses violently)."""
    if key is None:
        key = jax.random.key(cfg.seed)
    a = scale_radius if scale_radius is not None else cfg.max_pos / 10.0
    kr, kdir, kmass = jax.random.split(key, 3)
    n = cfg.n_bodies
    dtype = cfg.jnp_dtype
    # Inverse-CDF sampling of the Plummer cumulative mass profile.
    u = jax.random.uniform(kr, (n,), minval=1e-6, maxval=1.0 - 1e-6)
    r = a / jnp.sqrt(u ** (-2.0 / 3.0) - 1.0)
    direction = jax.random.normal(kdir, (n, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    pos = (r[:, None] * direction).astype(dtype)
    mass = jax.random.uniform(
        kmass, (n,), minval=cfg.min_mass, maxval=cfg.max_mass).astype(dtype)
    zeros = jnp.zeros((n, 3), dtype=dtype)
    return SimState(pos=pos, vel=zeros, acc=zeros, mass=mass)
