"""Step/integration correctness: lock-step trajectory comparison against the
CPU oracle, mirroring compareHostToDevice (validation.cpp:55-103) — the
reference runs 1,000 lock-step steps; tests use shorter runs (the full 1k-step
gate lives in the bench/validation harness) at the same 1% tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu import SimConfig, SimState, init_state, prime_kdk, run_steps, run_trajectory, step
from nbody_tpu.oracle.numpy_oracle import assert_matches_oracle, oracle_run
from conftest import make_small_system


def make_state(n, seed=0):
    pos, vel, mass = make_small_system(n, seed=seed)
    return SimState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        acc=jnp.zeros((n, 3), jnp.float32), mass=jnp.asarray(mass)), pos, vel, mass


@pytest.mark.parametrize("impl", ["xla_nxn", "xla"])
def test_lockstep_100_steps(impl):
    n, steps = 256, 100
    state, pos, vel, mass = make_state(n)
    cfg = SimConfig(n_bodies=n, impl=impl, chunk=64)
    out = run_steps(state, cfg, steps)
    rpos, rvel, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos@100", abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.vel), rvel, "vel@100", abs_tol=1e-2)
    assert_matches_oracle(np.asarray(out.acc), racc, "acc@100", abs_tol=1e-6)


def test_single_step_exact_semantics():
    """One step must implement: a=f(x); v+=0.5*dt*a; x+=dt*v — in that order
    (kernel.cu:116-124)."""
    n = 64
    state, pos, vel, mass = make_state(n, seed=5)
    cfg = SimConfig(n_bodies=n, impl="xla_nxn")
    out = step(state, cfg)
    rpos, rvel, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, 1)
    np.testing.assert_allclose(np.asarray(out.acc), racc, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.vel), rvel, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.pos), rpos, rtol=1e-5, atol=1e-2)


def test_trajectory_capture():
    n = 128
    state, *_ = make_state(n, seed=6)
    cfg = SimConfig(n_bodies=n, impl="xla_nxn")
    final, snaps = run_trajectory(state, cfg, n_steps=10, snap_every=2)
    assert snaps.shape == (5, n, 3)
    np.testing.assert_array_equal(np.asarray(snaps[-1]), np.asarray(final.pos))
    # Consecutive snapshots differ (the system is moving).
    assert not np.allclose(np.asarray(snaps[0]), np.asarray(snaps[-1]))


def test_trajectory_remainder_steps_run():
    """snap_every not dividing n_steps: the final state still reflects all
    n_steps (remainder runs after the last snapshot)."""
    n = 64
    state, *_ = make_state(n, seed=8)
    cfg = SimConfig(n_bodies=n, impl="xla_nxn")
    final, snaps = run_trajectory(state, cfg, n_steps=7, snap_every=3)
    assert snaps.shape[0] == 2
    expect = run_steps(state, cfg, 7)
    np.testing.assert_array_equal(np.asarray(final.pos),
                                  np.asarray(expect.pos))


def test_kdk_integrator_runs_and_conserves_better():
    """KDK is the opt-in textbook leapfrog; check it runs and stays finite."""
    n = 128
    state, *_ = make_state(n, seed=7)
    cfg = SimConfig(n_bodies=n, impl="xla_nxn", integrator="kdk", dt=0.01)
    state = prime_kdk(state, cfg)
    out = run_steps(state, cfg, 50)
    assert np.all(np.isfinite(np.asarray(out.pos)))
    assert np.all(np.isfinite(np.asarray(out.vel)))


def test_yoshida4_matches_oracle():
    """Device yoshida4 vs the independent NumPy yoshida4 twin: same
    trajectory within the differential gate (the per-sub-step force sweeps
    and weights must line up exactly; a wrong weight ordering diverges in
    one step)."""
    n, steps = 256, 10
    state, pos, vel, mass = make_state(n, seed=11)
    cfg = SimConfig(n_bodies=n, impl="xla_nxn", integrator="yoshida4",
                    dt=0.01)
    state = prime_kdk(state, cfg)
    out = run_steps(state, cfg, steps)
    rpos, rvel, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps,
                               integrator="yoshida4")
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(yoshida4)",
                          abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.vel), rvel, "vel(yoshida4)",
                          abs_tol=1e-2)


def test_init_state_ranges():
    cfg = SimConfig(n_bodies=1000, seed=3)
    s = init_state(cfg)
    pos = np.asarray(s.pos)
    mass = np.asarray(s.mass)
    assert pos.shape == (1000, 3) and mass.shape == (1000,)
    assert np.all(np.abs(pos) <= cfg.max_pos)
    assert np.all((mass >= cfg.min_mass) & (mass <= cfg.max_mass))
    assert np.all(np.asarray(s.vel) == 0) and np.all(np.asarray(s.acc) == 0)
    # Deterministic under the same seed (reference is accidentally
    # deterministic via unseeded rand(); ours is deliberately so).
    s2 = init_state(cfg)
    np.testing.assert_array_equal(pos, np.asarray(s2.pos))


def test_trajectory_capture_with_vel():
    """with_vel=True returns (final, pos_snaps, vel_snaps); both streams
    bit-match the states run_steps reaches at the same step counts."""
    n = 96
    state, *_ = make_state(n, seed=9)
    cfg = SimConfig(n_bodies=n, impl="xla_nxn")
    final, snaps, vsnaps = run_trajectory(
        state, cfg, n_steps=6, snap_every=2, with_vel=True)
    assert snaps.shape == vsnaps.shape == (3, n, 3)
    np.testing.assert_array_equal(np.asarray(snaps[-1]),
                                  np.asarray(final.pos))
    np.testing.assert_array_equal(np.asarray(vsnaps[-1]),
                                  np.asarray(final.vel))
    for k, steps in enumerate((2, 4, 6)):
        ref = run_steps(state, cfg, steps)
        np.testing.assert_array_equal(np.asarray(snaps[k]),
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(vsnaps[k]),
                                      np.asarray(ref.vel))
