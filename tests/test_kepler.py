"""Closed-form two-body (Kepler) analytic gates — the validation layer the
reference lacks (its gates are purely differential, validation.cpp:55-103).

Verifies, against exact solutions of the project force law:
  * the reference integrator (v += 0.5*dt*a; x += dt*v, kernel.cu:116-124)
    integrates HALF-FORCE dynamics, at first order;
  * the opt-in KDK integrator is true second-order leapfrog;
  * the yoshida4 integrator converges at 4th order and, like KDK, is
    exactly time-reversible (palindromic composition) — while the
    reference scheme is not;
  * all through the product step path (ops.step.run_steps).
"""

import math

import jax
import numpy as np
import pytest

from nbody_tpu import SimConfig, prime_kdk, run_steps
from nbody_tpu.models.energy import energy_f64
from nbody_tpu.models.kepler import (
    circular_positions, elliptic_positions, max_rel_error,
    run_analytic_gates, solve_kepler, two_body_circular, two_body_elliptic)


@pytest.fixture()
def x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


def test_solve_kepler_roundtrip():
    ecc = np.linspace(0.0, 2.0 * np.pi, 101)
    for e in (0.0, 0.3, 0.9, 0.99):
        m_anom = ecc - e * np.sin(ecc)
        back = solve_kepler(m_anom, e)
        np.testing.assert_allclose(back, ecc, atol=1e-12)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_analytic_gates_pass(dtype, x64):
    results = run_analytic_gates(impl="xla_nxn", dtype=dtype,
                                 steps_per_period=1024)
    assert [r["gate"] for r in results] == [
        "circular/reference", "circular/kdk", "circular/yoshida4",
        "elliptic(e=0.6)/kdk", "elliptic(e=0.6)/yoshida4"]
    for r in results:
        assert r["ok"], r


def _orbit_error(gate, steps_per_period, dtype="float64"):
    """One period through run_steps; max position error vs closed form."""
    integ = gate.split("/")[1]
    if gate.startswith("circular"):
        eps2 = 0.01
        state, w = two_body_circular(1.0, 1.0, 0.5, eps2, integ, dtype)
        period = 2.0 * math.pi / w
        cfg = SimConfig(n_bodies=2, dt=period / steps_per_period, eps2=eps2,
                        impl="xla_nxn", dtype=dtype, integrator=integ)
        ref = circular_positions(period, 1.0, 1.0, 0.5, eps2, integ)
    else:
        state, period = two_body_elliptic(1.0, 0.6, 1.0, 0.5, dtype)
        cfg = SimConfig(n_bodies=2, dt=period / steps_per_period, eps2=1e-10,
                        impl="xla_nxn", dtype=dtype, integrator=integ)
        ref = elliptic_positions(period, 1.0, 0.6, 1.0, 0.5)
    if cfg.integrator != "reference":
        state = prime_kdk(state, cfg)
    out = run_steps(state, cfg, steps_per_period)
    return max_rel_error(out.pos, ref, 1.0)


@pytest.mark.parametrize("gate,lo,hi", [
    # Error ratio when dt halves: ~2 for the first-order reference scheme,
    # ~4 for second-order KDK (measured 2.03-2.18 / 4.00 / 4.00-4.01),
    # ~16 for 4th-order Yoshida (measured 15.84-16.13; run at coarser dt so
    # the error stays far above the f64 noise floor).
    ("circular/reference", 1.7, 2.8),
    ("circular/kdk", 3.4, 4.6),
    ("elliptic/kdk", 3.4, 4.6),
    ("circular/yoshida4", 13.0, 19.5),
    ("elliptic/yoshida4", 13.0, 19.5),
])
def test_convergence_order(gate, lo, hi, x64):
    spp = 128 if gate.endswith("yoshida4") else 1024
    e1 = _orbit_error(gate, spp)
    e2 = _orbit_error(gate, 2 * spp)
    e4 = _orbit_error(gate, 4 * spp)
    assert lo < e1 / e2 < hi, (e1, e2)
    assert lo < e2 / e4 < hi, (e2, e4)


def test_reference_scheme_is_half_force(x64):
    """A circular orbit initialized for TRUE-force dynamics decays badly
    under the reference scheme, while the half-force initialization stays
    on its circle — the discriminating experiment for the modified-dynamics
    statement in models/kepler.py."""
    eps2, spp = 0.01, 1024

    def run(integrator_for_omega):
        state, w = two_body_circular(1.0, 1.0, 0.5, eps2,
                                     integrator_for_omega, "float64")
        period = 2.0 * math.pi / w
        cfg = SimConfig(n_bodies=2, dt=period / spp, eps2=eps2,
                        impl="xla_nxn", dtype="float64",
                        integrator="reference")
        out = run_steps(state, cfg, spp)
        ref = circular_positions(period, 1.0, 1.0, 0.5, eps2,
                                 integrator_for_omega)
        return max_rel_error(out.pos, ref, 1.0)

    matched = run("reference")   # half-force omega under half-force scheme
    mismatched = run("kdk")      # true-force omega under half-force scheme
    assert matched < 1e-3
    assert mismatched > 100 * matched


def test_elliptic_energy_bounded_over_10_periods(x64):
    """Leapfrog is symplectic: over many periods of an e=0.6 orbit the
    energy error stays BOUNDED (no secular drift) — gate at 1e-6 relative
    across 10 periods in f64."""
    state, period = two_body_elliptic(1.0, 0.6, 1.0, 0.5, "float64")
    spp = 2048
    cfg = SimConfig(n_bodies=2, dt=period / spp, eps2=1e-10,
                    impl="xla_nxn", dtype="float64", integrator="kdk")
    state = prime_kdk(state, cfg)
    e0 = energy_f64(state, cfg.eps2)
    worst = 0.0
    for _ in range(10):
        state = run_steps(state, cfg, spp)
        drift = abs(energy_f64(state, cfg.eps2) - e0) / abs(e0)
        worst = max(worst, drift)
    assert worst < 1e-6, worst


def test_two_body_momentum_zero(x64):
    for maker in (lambda d: two_body_circular(dtype=d)[0],
                  lambda d: two_body_elliptic(dtype=d)[0]):
        st = maker("float64")
        p = (np.asarray(st.mass)[:, None] * np.asarray(st.vel)).sum(axis=0)
        np.testing.assert_allclose(p, 0.0, atol=1e-15)


@pytest.mark.parametrize("integ,tol", [("kdk", 1e-9), ("yoshida4", 1e-9)])
def test_time_reversibility(integ, tol, x64):
    """KDK and yoshida4 are palindromic compositions, hence exactly
    time-reversible: one period forward, negate velocities, one period
    back must return to the initial state up to f64 roundoff.  (The
    reference scheme is NOT reversible — checked below.)"""
    state, period = two_body_elliptic(1.0, 0.6, 1.0, 0.5, "float64")
    spp = 512
    cfg = SimConfig(n_bodies=2, dt=period / spp, eps2=1e-10,
                    impl="xla_nxn", dtype="float64", integrator=integ)
    pos0 = np.asarray(state.pos).copy()
    fwd = run_steps(prime_kdk(state, cfg), cfg, spp)
    back = fwd._replace(vel=-fwd.vel)
    out = run_steps(prime_kdk(back, cfg), cfg, spp)
    err = max_rel_error(out.pos, pos0, 1.0)
    assert err < tol, err


def test_reference_scheme_not_reversible(x64):
    """Discriminator: the reference's half-kick-then-drift update is not
    self-adjoint, so the same round trip misses by orders of magnitude
    more than roundoff."""
    state, period = two_body_elliptic(1.0, 0.6, 1.0, 0.5, "float64")
    spp = 512
    cfg = SimConfig(n_bodies=2, dt=period / spp, eps2=1e-10,
                    impl="xla_nxn", dtype="float64", integrator="reference")
    pos0 = np.asarray(state.pos).copy()
    fwd = run_steps(state, cfg, spp)
    out = run_steps(fwd._replace(vel=-fwd.vel), cfg, spp)
    err = max_rel_error(out.pos, pos0, 1.0)
    assert err > 1e-4, err
