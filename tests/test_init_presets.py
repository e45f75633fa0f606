"""Structured initial conditions (models/init.py beyond the reference's
uniform box): virialized Plummer, rotating disk, two-cluster collision."""

import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models.energy import energy_f64
from nbody_tpu.models.init import (INIT_MAKERS, collision_state, disk_state,
                                   plummer_virial_state)


def _np(x):
    return np.asarray(x, dtype=np.float64)


def test_plummer_virial_is_near_equilibrium():
    """Sampled from the exact Plummer DF: the virial ratio 2T/|W| should
    be ~1 (finite-N scatter allowed), total momentum exactly zeroed, and
    the system bound (E < 0)."""
    cfg = SimConfig(n_bodies=2048, seed=3, eps2=1e-6)
    st = plummer_virial_state(cfg)
    pos, vel, mass = _np(st.pos), _np(st.vel), _np(st.mass)
    ke = 0.5 * np.sum(mass * np.sum(vel ** 2, axis=1))
    e = float(energy_f64(st, cfg.eps2))
    pe = e - ke
    assert pe < 0 and e < 0
    virial = 2.0 * ke / abs(pe)
    assert 0.7 < virial < 1.3, virial
    p = np.sum(mass[:, None] * vel, axis=0)
    scale = np.sum(mass * np.linalg.norm(vel, axis=1))
    np.testing.assert_allclose(p / scale, 0.0, atol=1e-6)


def test_disk_is_thin_and_rotating():
    cfg = SimConfig(n_bodies=1024, seed=5)
    st = disk_state(cfg)
    pos, vel, mass = _np(st.pos), _np(st.vel), _np(st.mass)
    a = cfg.max_pos / 4.0
    # Thin: z extent well under the radial extent.
    assert np.percentile(np.abs(pos[:, 2]), 95) < 0.2 * a
    assert np.max(np.linalg.norm(pos[:, :2], axis=1)) <= a * 1.0001
    # Rotating about z: L_z dominant and every body prograde.
    L = np.sum(mass[:, None] * np.cross(pos, vel), axis=0)
    assert abs(L[2]) > 50 * max(abs(L[0]), abs(L[1]))
    lz_body = pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0]
    assert np.all(lz_body > 0)


def test_collision_is_momentum_balanced_two_clusters():
    cfg = SimConfig(n_bodies=2000, seed=7)
    st = collision_state(cfg)
    pos, vel, mass = _np(st.pos), _np(st.vel), _np(st.mass)
    p = np.sum(mass[:, None] * vel, axis=0)
    scale = np.sum(mass * np.linalg.norm(vel, axis=1))
    np.testing.assert_allclose(p / scale, 0.0, atol=1e-6)
    # Two clusters around +-d/2 on x, approaching each other.
    a = cfg.max_pos / 10.0
    left, right = pos[:, 0] < 0, pos[:, 0] >= 0
    assert 0.3 < left.mean() < 0.7
    assert np.mean(pos[left, 0]) < -2 * a and np.mean(pos[right, 0]) > 2 * a
    assert np.mean(vel[left, 0]) > 0 and np.mean(vel[right, 0]) < 0


def test_init_registry_and_cli_parse():
    assert set(INIT_MAKERS) == {"plummer", "plummer-virial", "disk",
                                "collision"}
    from nbody_tpu.cli import build_parser
    p = build_parser()
    for name in ("uniform", "plummer", "plummer-virial", "disk",
                 "collision"):
        assert p.parse_args(["run", "--init", name]).init == name


@pytest.mark.parametrize("name", ["plummer-virial", "disk", "collision"])
def test_presets_run_through_simulation(name):
    """Each preset survives a short Simulation run: finite state, and
    the run routes like any other state of that N."""
    from nbody_tpu.models.simulation import Simulation
    cfg = SimConfig(n_bodies=512, seed=1, dt=0.01)
    sim = Simulation(cfg, state=INIT_MAKERS[name](cfg))
    res = sim.run(n_steps=3, log_every=0)
    assert np.all(np.isfinite(_np(res.state.pos)))
