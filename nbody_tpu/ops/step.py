"""Jitted simulation step and multi-step drivers.

The reference's host loop launches one kernel per step with a
``cudaDeviceSynchronize`` barrier every iteration (``main.cpp:142-160``,
``kernel.cu:644``) — two host<->device boundary crossings per step.  The
TPU-native equivalent compiles the *whole run* into one XLA program: a single
``step`` is a jitted function (force + fused integration, so pos/vel/acc never
leave HBM), and ``run_steps`` wraps it in ``lax.fori_loop`` — zero host
round-trips until the loop finishes.  ``run_trajectory`` is the ``lax.scan``
variant that additionally captures snapshots on-device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..models.integrators import (KDK_WEIGHTS, kdk_drift, kdk_kick,
                                  reference_update)
from ..models.state import SimState
from .forces import compute_forces, resolve_impl
from .forces_pallas_sym import DEFAULT_PROG_CAP


_SYM_IMPL_VARIANTS = {"pallas_sym": "vpu", "pallas_sym2": "vpu2",
                      "pallas_sym_turbo": "turbo",
                      "pallas_sym_turbo2": "turbo2", "pallas_sym_mxu": "mxu"}

# Above this many bodies, state must use the flat (3N,) layout end to end:
# any device op consuming an (N, 3) array materializes a T(8,128) tiled
# copy padding the minor dim 3->128 (42.7x — 8.06 GiB at N=16.8M, measured
# OOM above ~20M; docs/PERF.md memory walls).  16.7M is the largest N
# measured safe through the (N, 3)-entry chunked path.
FLAT_AUTO_THRESHOLD = 1 << 24


def should_use_flat(cfg: SimConfig, impl: str) -> bool:
    """Single source of truth for flat-state routing: an explicit
    ``cfg.flat_state`` wins; auto engages above ``FLAT_AUTO_THRESHOLD``
    bodies for the pallas_sym* impls (the only family with a flat core)."""
    if cfg.flat_state is not None:
        if cfg.flat_state and impl not in _SYM_IMPL_VARIANTS:
            raise ValueError(
                f"flat-state mode requires a pallas_sym* impl, got {impl!r}")
        return cfg.flat_state
    return (impl in _SYM_IMPL_VARIANTS
            and cfg.n_bodies > FLAT_AUTO_THRESHOLD)


def should_use_multiprog(cfg: SimConfig, impl: str,
                         n_devices: int = 1) -> bool:
    """Single source of truth for bounded-program routing: an explicit
    ``cfg.prog_cap`` forces it; otherwise it engages when one fused force
    evaluation would exceed the default per-program bound (past which
    execution-time-limited runtimes kill the program).  On a mesh the
    bound applies PER CHIP (the eval is N²/P interactions per chip;
    ``parallel/multiprog.py`` is the mesh dispatcher)."""
    return (impl in _SYM_IMPL_VARIANTS
            and (cfg.prog_cap is not None
                 or float(cfg.n_bodies) ** 2 / max(1, n_devices)
                 > DEFAULT_PROG_CAP))


def max_fused_steps(cfg: SimConfig) -> int:
    """How many steps one FUSED program may contain under the program cap.

    The execution bound applies to a whole device program, and a fused
    ``run_steps`` chunk costs steps x N² interactions — at N=1M a 25-step
    chunk is a ~100 s program, past the same ~60 s kill that motivates
    per-step multiprog at N>=4M (measured: a 1M 'run --log-every 25'
    crashed the worker).  Callers chunk fused dispatch to this many
    steps; chained chunks queue asynchronously, so timing semantics are
    unchanged."""
    cap = cfg.prog_cap or DEFAULT_PROG_CAP
    # KDK-composed integrators cost one force sweep per sub-step weight
    # (yoshida4 = 3 sweeps/step); the cap bounds total sweeps per program.
    evals = len(KDK_WEIGHTS.get(cfg.integrator, (1.0,)))
    return max(1, int(cap // max(1, evals * cfg.interactions_per_step)))


def compute_forces_bounded(pos, mass, cfg: SimConfig, impl: str,
                           progress=None):
    """One force evaluation through the bounded multi-program dispatcher
    (``forces_pallas_sym_chunked``) at the config's cap."""
    from .forces_pallas_sym import forces_pallas_sym_chunked
    return forces_pallas_sym_chunked(
        pos, mass, cfg.eps2, block_i=cfg.block_i, block_u=cfg.block_u,
        panel_nb=cfg.panel_nb, variant=_SYM_IMPL_VARIANTS[impl],
        max_prog_interactions=cfg.prog_cap or DEFAULT_PROG_CAP,
        progress=progress)


def step(state: SimState, cfg: SimConfig, impl: "str | None" = None) -> SimState:
    """One simulation step. Matches the semantics of one ``simulate`` call
    (kernel.cu:628-645): forces from current positions, then the fused
    half-kick + drift update (or KDK when configured)."""
    impl = impl or resolve_impl(cfg)
    if cfg.integrator == "reference":
        acc = compute_forces(state.pos, state.mass, cfg, impl=impl)
        pos, vel = reference_update(state.pos, state.vel, acc, cfg.dt)
        return SimState(pos=pos, vel=vel, acc=acc, mass=state.mass)
    weights = KDK_WEIGHTS.get(cfg.integrator)
    if weights is not None:
        # KDK-composed schemes (kdk = one sub-step, yoshida4 = three): each
        # sub-step is kick-drift-kick over weight*dt, chaining a(x) through
        # state.acc (seed a(x_0) via `prime_kdk`).
        pos, vel, acc = state.pos, state.vel, state.acc
        for w in weights:
            wdt = w * cfg.dt
            vel_half = kdk_kick(vel, acc, wdt)
            pos = kdk_drift(pos, vel_half, wdt)
            acc = compute_forces(pos, state.mass, cfg, impl=impl)
            vel = kdk_kick(vel_half, acc, wdt)
        return SimState(pos=pos, vel=vel, acc=acc, mass=state.mass)
    raise ValueError(f"unknown integrator {cfg.integrator!r}")


def prime_kdk(state: SimState, cfg: SimConfig,
              impl: "str | None" = None, progress=None) -> SimState:
    """Seed state.acc = a(x_0) so the KDK integrator's first half-kick is
    consistent.  Routes through the bounded multi-program dispatcher when
    the config engages it (a fused priming evaluation at N>=4M is exactly
    the over-long program the cap exists to avoid).  ``progress`` is the
    bounded dispatcher's per-program callback — at huge N the priming
    eval spans many programs and deserves a heartbeat too."""
    impl = impl or resolve_impl(cfg)
    if should_use_multiprog(cfg, impl):
        acc = compute_forces_bounded(state.pos, state.mass, cfg, impl,
                                     progress=progress)
    else:
        acc = compute_forces(state.pos, state.mass, cfg, impl=impl)
    return state._replace(acc=acc)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "impl"))
def run_steps(state: SimState, cfg: SimConfig, n_steps: int,
              impl: "str | None" = None) -> SimState:
    """Run n_steps inside one compiled fori_loop (the benchmark path)."""
    return jax.lax.fori_loop(
        0, n_steps, lambda _, s: step(s, cfg, impl=impl), state)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "snap_every", "impl", "with_vel"))
def run_trajectory(
        state: SimState, cfg: SimConfig, n_steps: int,
        snap_every: int = 1, impl: "str | None" = None,
        with_vel: bool = False) -> Tuple[SimState, jax.Array]:
    """Run n_steps, capturing positions every ``snap_every`` steps on-device.

    Returns (final_state, snapshots (n_steps//snap_every, N, 3)).  If
    snap_every does not divide n_steps, the remainder steps still run after
    the last snapshot (the final state reflects all n_steps).

    ``with_vel=True`` additionally captures velocities (doubling the
    snapshot transfer) and returns ``(final_state, snapshots,
    vel_snapshots)`` — this is what gives saved trajectories an energy /
    virial story (``analysis.analyze_trajectory``), which positions alone
    cannot carry.
    """
    def outer(s, _):
        s = jax.lax.fori_loop(
            0, snap_every, lambda _, st: step(st, cfg, impl=impl), s)
        return s, ((s.pos, s.vel) if with_vel else s.pos)
    n_snaps = n_steps // snap_every
    final, snaps = jax.lax.scan(outer, state, None, length=n_snaps)
    rem = n_steps - n_snaps * snap_every
    if rem:
        final = jax.lax.fori_loop(
            0, rem, lambda _, st: step(st, cfg, impl=impl), final)
    if with_vel:
        return (final,) + snaps
    return final, snaps


# Module-level jitted integrator helpers for the host-driven multiprog
# loop (rebuilding jit wrappers per call would discard their trace cache
# and re-lower through the remote relay every Simulation chunk).
_ref_update_jit = jax.jit(reference_update)
_kick_jit = jax.jit(kdk_kick)
_drift_jit = jax.jit(kdk_drift)


def run_steps_multiprog(state: SimState, cfg: SimConfig, n_steps: int,
                        impl: "str | None" = None,
                        max_prog_interactions: "float | None" = None,
                        progress=None) -> SimState:
    """Host-driven step loop with the force evaluation split into multiple
    bounded device programs (``forces_pallas_sym_chunked``).

    For problem sizes where ONE fused step exceeds an execution-time limit
    (N=4M exact is ~71 s of kernel time — past the relay's ~60 s
    single-program kill, and past what a preemptible production scheduler
    tolerates), this trades the fori_loop fusion for bounded program
    granularity.  State stays device-resident throughout; the only added
    cost is per-program dispatch latency.
    """
    from .forces_pallas_sym import DEFAULT_PROG_CAP, forces_pallas_sym_chunked
    impl = impl or resolve_impl(cfg)
    variant = _SYM_IMPL_VARIANTS.get(impl)
    if variant is None:
        raise ValueError(
            f"run_steps_multiprog requires a pallas_sym* impl, got {impl!r}")
    if max_prog_interactions is None:
        max_prog_interactions = cfg.prog_cap or DEFAULT_PROG_CAP

    def forces(pos):
        return forces_pallas_sym_chunked(
            pos, state.mass, cfg.eps2, block_i=cfg.block_i,
            block_u=cfg.block_u, panel_nb=cfg.panel_nb, variant=variant,
            max_prog_interactions=max_prog_interactions,
            progress=progress)

    weights = KDK_WEIGHTS.get(cfg.integrator)
    for _ in range(n_steps):
        if cfg.integrator == "reference":
            acc = forces(state.pos)
            pos, vel = _ref_update_jit(state.pos, state.vel, acc, cfg.dt)
            state = SimState(pos=pos, vel=vel, acc=acc, mass=state.mass)
        elif weights is not None:
            pos, vel, acc = state.pos, state.vel, state.acc
            for w in weights:
                wdt = w * cfg.dt
                vel_half = _kick_jit(vel, acc, wdt)
                pos = _drift_jit(pos, vel_half, wdt)
                acc = forces(pos)
                vel = _kick_jit(vel_half, acc, wdt)
            state = SimState(pos=pos, vel=vel, acc=acc, mass=state.mass)
        else:
            raise ValueError(f"unknown integrator {cfg.integrator!r}")
    return state


def run_steps_multiprog_flat(pos_flat, vel_flat, acc_flat, mass,
                             cfg: SimConfig, n_steps: int,
                             impl: "str | None" = None,
                             max_prog_interactions: "float | None" = None,
                             progress=None):
    """``run_steps_multiprog`` on FLAT row-major state arrays
    (``(3N,)`` pos/vel/acc + ``(N,)`` mass) — the >20M-body mode.

    Above ~20M bodies an ``(N, 3)`` array cannot even be flattened on
    device (any program op consuming it tile-copies at 42.7x — 17.2 GB at
    N=32M; docs/PERF.md memory walls), so huge-N state must be flat END
    TO END: the integrators are elementwise (shape-agnostic) and the
    force dispatcher has a flat core
    (``forces_pallas_sym_chunked_flat``).  Returns the advanced
    ``(pos_flat, vel_flat, acc_flat)``."""
    from .forces_pallas_sym import (DEFAULT_PROG_CAP,
                                    forces_pallas_sym_chunked_flat)
    impl = impl or resolve_impl(cfg)
    variant = _SYM_IMPL_VARIANTS.get(impl)
    if variant is None:
        raise ValueError(
            f"run_steps_multiprog_flat requires a pallas_sym* impl, "
            f"got {impl!r}")
    if max_prog_interactions is None:
        max_prog_interactions = cfg.prog_cap or DEFAULT_PROG_CAP

    def forces(p):
        return forces_pallas_sym_chunked_flat(
            p, mass, cfg.eps2, block_i=cfg.block_i, block_u=cfg.block_u,
            panel_nb=cfg.panel_nb, variant=variant,
            max_prog_interactions=max_prog_interactions,
            progress=progress)

    weights = KDK_WEIGHTS.get(cfg.integrator)
    for _ in range(n_steps):
        if cfg.integrator == "reference":
            acc_flat = forces(pos_flat)
            pos_flat, vel_flat = _ref_update_jit(pos_flat, vel_flat,
                                                 acc_flat, cfg.dt)
        elif weights is not None:
            for w in weights:
                wdt = w * cfg.dt
                vel_half = _kick_jit(vel_flat, acc_flat, wdt)
                pos_flat = _drift_jit(pos_flat, vel_half, wdt)
                acc_flat = forces(pos_flat)
                vel_flat = _kick_jit(vel_half, acc_flat, wdt)
        else:
            raise ValueError(f"unknown integrator {cfg.integrator!r}")
    return pos_flat, vel_flat, acc_flat


def run_steps_flat(flat, cfg: SimConfig, n_steps: int,
                   impl: "str | None" = None,
                   max_prog_interactions: "float | None" = None,
                   progress=None):
    """``FlatState``-level step driver (the product entry of the >16M-body
    mode; ``Simulation`` routes here when ``should_use_flat`` engages).
    Always bounded-program dispatch — at flat-mode N one fused step is far
    past any per-program execution bound."""
    from ..models.state import FlatState
    pos, vel, acc = run_steps_multiprog_flat(
        flat.pos, flat.vel, flat.acc, flat.mass, cfg, n_steps, impl=impl,
        max_prog_interactions=max_prog_interactions, progress=progress)
    return FlatState(pos=pos, vel=vel, acc=acc, mass=flat.mass)


def prime_kdk_flat(flat, cfg: SimConfig, impl: "str | None" = None,
                   progress=None):
    """Seed ``flat.acc = a(x_0)`` through the flat bounded dispatcher (the
    flat analog of ``prime_kdk``)."""
    from .forces_pallas_sym import forces_pallas_sym_chunked_flat
    impl = impl or resolve_impl(cfg)
    acc = forces_pallas_sym_chunked_flat(
        flat.pos, flat.mass, cfg.eps2, block_i=cfg.block_i,
        block_u=cfg.block_u, panel_nb=cfg.panel_nb,
        variant=_SYM_IMPL_VARIANTS[impl],
        max_prog_interactions=cfg.prog_cap or DEFAULT_PROG_CAP,
        progress=progress)
    return flat._replace(acc=acc)


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_steps", "frame_every", "impl",
                              "packed"))
def run_trajectory_frames(
        state: SimState, cfg: SimConfig, n_steps: int,
        frame_every: int = 1,
        impl: "str | None" = None,
        packed: bool = False,
        view: "tuple | None" = None) -> Tuple[SimState, jax.Array]:
    """Run n_steps with RENDERED frames captured on device inside the scan.

    The interactive-rate path (VERDICT round 1): the reference renders
    every step with zero compute<->render copies via CUDA-GL interop
    (main.cpp:118-133, kernel.cu:477-481); here the rasterizer runs inside
    the compiled loop so frames batch through the device->host link in ONE
    transfer per chunk instead of one round-trip per frame (the round-trip,
    not the rasterizer, was the 7 fps bottleneck through the relay).

    Returns (final_state, frames): (F, H, W, 3) uint8 RGB, or with
    ``packed=True`` an (F, H, W) uint8 weight map (1 byte/pixel — the
    bandwidth-lean wire format; ``viz.raster.colorize`` reproduces the RGB
    pixels exactly on the host).

    ``view``: optional ``(max_view, cu, cv)`` TRACED scalars overriding
    the config's fixed camera — the live viewer's zoom/pan.  Passed as
    plain floats they trace as f32 scalars, so per-chunk view changes
    recompile nothing.
    """
    from ..viz.raster import render_frame, render_weights

    render = render_weights if packed else render_frame
    mv, cu, cv = view if view is not None else (cfg.max_view, 0.0, 0.0)

    def outer(s, _):
        s = jax.lax.fori_loop(
            0, frame_every, lambda _, st: step(st, cfg, impl=impl), s)
        frame = render(
            s.pos, s.mass, cfg.min_mass, cfg.max_mass, mv,
            cfg.viz_width, cfg.viz_height, 2, cu, cv)
        return s, frame
    n_frames = n_steps // frame_every
    final, frames = jax.lax.scan(outer, state, None, length=n_frames)
    rem = n_steps - n_frames * frame_every
    if rem:
        final = jax.lax.fori_loop(
            0, rem, lambda _, st: step(st, cfg, impl=impl), final)
    return final, frames
