"""Simulation driver: chunked run loop, watchdog, resume, energy tracking."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu import SimConfig, SimState
from nbody_tpu.io.checkpoint import save_checkpoint
from nbody_tpu.io.logger import RunLogger
from nbody_tpu.models.simulation import Simulation
from conftest import make_small_system


def make_state(n, seed=0):
    pos, vel, mass = make_small_system(n, seed=seed)
    return SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                    acc=jnp.zeros((n, 3), jnp.float32),
                    mass=jnp.asarray(mass))


def test_run_reports_throughput():
    cfg = SimConfig(n_bodies=128, impl="xla_nxn")
    sim = Simulation(cfg, state=make_state(128, seed=70),
                     logger=RunLogger(quiet=True))
    res = sim.run(n_steps=30, log_every=10)
    assert res.steps_run == 30
    assert res.ms_per_step > 0
    assert sim.step_count == 30


def test_nan_watchdog_trips():
    cfg = SimConfig(n_bodies=64, impl="xla_nxn")
    state = make_state(64, seed=71)
    # Poison one position with inf: the next force evaluation propagates it.
    bad_pos = state.pos.at[0, 0].set(jnp.inf)
    sim = Simulation(cfg, state=state._replace(pos=bad_pos),
                     logger=RunLogger(quiet=True))
    with pytest.raises(FloatingPointError, match="non-finite"):
        sim.run(n_steps=5, log_every=1)


def test_energy_tracking():
    cfg = SimConfig(n_bodies=128, impl="xla_nxn", dt=0.001)
    sim = Simulation(cfg, state=make_state(128, seed=72),
                     logger=RunLogger(quiet=True))
    res = sim.run(n_steps=5, log_every=0, track_energy=True)
    assert res.energy_initial is not None and res.energy_final is not None
    assert res.energy_drift is not None and res.energy_drift < 0.1


def test_resume_classmethod(tmp_path):
    cfg = SimConfig(n_bodies=64, impl="xla_nxn")
    state = make_state(64, seed=73)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state, step=7, cfg=cfg)
    sim = Simulation.resume(p, logger=RunLogger(quiet=True))
    assert sim.step_count == 7
    assert sim.cfg == cfg
    sim.run(n_steps=3, log_every=0)
    assert sim.step_count == 10


def test_sort_every_preserves_mass_multiset():
    cfg = SimConfig(n_bodies=256, impl="xla_nxn")
    state = make_state(256, seed=74)
    sim = Simulation(cfg, state=state, logger=RunLogger(quiet=True))
    sim.run(n_steps=6, log_every=0, sort_every=2)
    np.testing.assert_allclose(
        np.sort(np.asarray(sim.state.mass)),
        np.sort(np.asarray(state.mass)))


def test_checkpoint_path_without_cadence_saves_final(tmp_path):
    from nbody_tpu.io.checkpoint import load_checkpoint
    cfg = SimConfig(n_bodies=64, impl="xla_nxn")
    sim = Simulation(cfg, state=make_state(64, seed=76),
                     logger=RunLogger(quiet=True))
    p = str(tmp_path / "final.npz")
    sim.run(n_steps=4, log_every=0, checkpoint_path=p)
    state, step, _ = load_checkpoint(p)
    assert step == 4
    np.testing.assert_array_equal(np.asarray(state.pos),
                                  np.asarray(sim.state.pos))


def test_kdk_simulation_primes_acc():
    cfg = SimConfig(n_bodies=64, impl="xla_nxn", integrator="kdk", dt=0.01)
    sim = Simulation(cfg, state=make_state(64, seed=75),
                     logger=RunLogger(quiet=True))
    # prime_kdk ran in __init__: acc must be nonzero before the first step.
    assert float(jnp.abs(sim.state.acc).max()) > 0
    sim.run(n_steps=3, log_every=0)


def test_prog_cap_routes_multiprog_and_matches():
    """An explicit prog_cap forces bounded-program dispatch; the result must
    match the fused single-program run."""
    n = 1536
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=64, block_u=128,
                    panel_nb=3)
    fused = Simulation(cfg, state=make_state(n, seed=77),
                       logger=RunLogger(quiet=True))
    fused.run(n_steps=3, log_every=0)
    capped = Simulation(cfg.replace(prog_cap=5e5),
                        state=make_state(n, seed=77),
                        logger=RunLogger(quiet=True))
    assert capped._use_multiprog
    assert not fused._use_multiprog
    capped.run(n_steps=3, log_every=0)
    np.testing.assert_allclose(np.asarray(capped.state.pos),
                               np.asarray(fused.state.pos),
                               rtol=1e-6, atol=1e-3)


def test_prog_cap_auto_threshold():
    """Without an explicit cap, multiprog engages only when one fused step
    would exceed the default per-program bound (N^2 > 1.2e13)."""
    from nbody_tpu.ops.forces_pallas_sym import DEFAULT_PROG_CAP
    small = Simulation(SimConfig(n_bodies=256, impl="pallas_sym",
                                 block_i=8, block_u=128),
                       state=make_state(256, seed=78),
                       logger=RunLogger(quiet=True))
    assert not small._use_multiprog
    # The auto threshold sits between practical fused sizes (N=2M) and the
    # relay-killed ones (N=4M).
    assert (2 << 20) ** 2 < DEFAULT_PROG_CAP < float(4 << 20) ** 2


def test_fused_chunk_bounded_by_prog_cap():
    """A fused chunk is one device program costing chunk*N^2 interactions;
    Simulation must bound it by the program cap even for non-sym impls
    (a 25-step chunk at N=1M crashed the execution-limited worker)."""
    from nbody_tpu.ops.step import max_fused_steps
    cfg = SimConfig(n_bodies=256, impl="xla_nxn",
                    prog_cap=float(256 * 256 * 3))
    assert max_fused_steps(cfg) == 3
    sim = Simulation(cfg, state=make_state(256, seed=80),
                     logger=RunLogger(quiet=True))
    assert not sim._use_multiprog   # xla impl: cap bounds chunking instead
    calls = []
    orig = sim._run_chunk

    def spy(k):
        calls.append(k)
        orig(k)

    sim._run_chunk = spy
    res = sim.run(n_steps=10, log_every=0)
    assert res.steps_run == 10
    assert max(calls) <= 3 and sum(calls) == 10


def test_mesh_chunk_bound_scales_per_chip():
    """On a mesh each chip's fused chunk costs chunk*N^2/P — the bound is
    cap//(N^2/P), NOT max(1, cap//N^2)*P (which under-bounds whenever
    N^2 > cap and the floor engages)."""
    from nbody_tpu.parallel.mesh import make_mesh
    n = 256
    # cap = one step's TOTAL interactions: per-chip cost is N^2/4, so up
    # to 4 steps fit per program on the 4-way mesh.
    cfg = SimConfig(n_bodies=n, impl="xla", prog_cap=float(n * n))
    mesh = make_mesh(4)
    sim = Simulation(cfg, state=make_state(n, seed=81),
                     logger=RunLogger(quiet=True), mesh=mesh)
    calls = []
    orig = sim._run_chunk
    sim._run_chunk = lambda k: (calls.append(k), orig(k))[1]
    sim.run(n_steps=10, log_every=0)
    assert max(calls) <= 4 and sum(calls) == 10


def test_chunks_end_at_modulo_trigger_boundaries(tmp_path):
    """An unaligned program bound must not skip done%cadence==0 triggers:
    chunks end exactly at checkpoint boundaries."""
    import os
    n = 256
    cfg = SimConfig(n_bodies=n, impl="xla_nxn",
                    prog_cap=float(n * n * 3))   # bound = 3 steps
    sim = Simulation(cfg, state=make_state(n, seed=82),
                     logger=RunLogger(quiet=True))
    calls = []
    orig = sim._run_chunk
    sim._run_chunk = lambda k: (calls.append(k), orig(k))[1]
    ck = str(tmp_path / "ck.npz")
    sim.run(n_steps=10, log_every=0, checkpoint_path=ck, checkpoint_every=5)
    # Cumulative step counts must include every multiple of 5.
    sums = [sum(calls[:i + 1]) for i in range(len(calls))]
    assert 5 in sums and 10 in sums and max(calls) <= 3
    assert os.path.exists(ck)


def test_priming_heartbeat_for_kdk_multiprog():
    """The KDK priming force eval in __init__ is as long as any stepping
    eval at huge N; it must heartbeat too (review r4: it ran silently,
    before run() could install one)."""
    import io as _io
    n = 3000
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", integrator="kdk",
                    block_i=64, block_u=256, panel_nb=3, prog_cap=1.0)
    stream = _io.StringIO()
    Simulation(cfg, logger=RunLogger(stream=stream))
    out = stream.getvalue()
    assert "force eval:" in out        # priming itself heartbeat
    # A quiet logger must stay silent (the default for library users).
    quiet = Simulation(cfg, logger=RunLogger(quiet=True))
    assert quiet.progress is None


def test_heartbeat_uninstalled_on_run_error():
    """run() owns the heartbeat it installs: error paths (NaN watchdog,
    checkpoint IO, Ctrl-C) must not leave it behind (review r4)."""
    import io as _io
    n = 3000
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=64,
                    block_u=256, panel_nb=3, prog_cap=1.0)
    sim = Simulation(cfg, logger=RunLogger(stream=_io.StringIO()))

    def boom(*a, **k):
        assert sim.progress is not None   # installed before the body runs
        raise RuntimeError("boom")

    sim._run_impl = boom
    with pytest.raises(RuntimeError, match="boom"):
        sim.run(n_steps=1)
    assert sim.progress is None           # uninstalled on the error path


def test_auto_log_every_targets_chunk_duration():
    """log_every=None sizes chunks to ~0.5 s of device work (relay syncs
    cost tens of ms — a fixed 100-step cadence at N=8192 measured 5x
    slow) while capping the line count at ~50/run."""
    from nbody_tpu.models.simulation import auto_log_every
    # Small N: duration-driven (0.5 s at 300 G/s), snapped to a divisor
    # of n_steps so every chunk shares ONE compiled program (a ragged
    # tail is a fresh multi-second compile).
    assert auto_log_every(SimConfig(n_bodies=8192), 100_000) == 2500
    assert auto_log_every(SimConfig(n_bodies=8192), 20_000) == 2500
    # No divisor >= target: the largest half-target divisor serves.
    assert auto_log_every(SimConfig(n_bodies=4096), 10_000) == 5000
    # Prime step counts fall back to the raw target (one ragged tail).
    assert auto_log_every(SimConfig(n_bodies=8192), 99_991) == 2235
    # Large N: one step exceeds the target; line cap takes over.
    assert auto_log_every(SimConfig(n_bodies=1 << 20), 10_000) == 200
    assert auto_log_every(SimConfig(n_bodies=1 << 20), 20) == 1


def test_banner_shows_routing_tags(capsys, monkeypatch):
    """The run banner names the engaged routing mode — `(resident)` when the
    VMEM-resident window routes, no tag on the plain per-step path — so a
    user can tell WHICH execution mode served the run (VERDICT r2 asked the
    flagship modes to be visible product features, not silent internals)."""
    n = 4096
    cfg = SimConfig(n_bodies=n, impl="pallas_sym2")
    sim = Simulation(cfg, state=make_state(n, seed=90), logger=RunLogger())
    assert sim._resident          # in the auto window, exact sym tier
    monkeypatch.setattr(sim, "_run_chunk", lambda k: None)
    sim.run(n_steps=2)
    out = capsys.readouterr().out
    assert "impl=pallas_sym2 (resident)" in out

    cfg2 = SimConfig(n_bodies=128, impl="xla")
    sim2 = Simulation(cfg2, state=make_state(128, seed=91),
                      logger=RunLogger())
    sim2.run(n_steps=2)
    out2 = capsys.readouterr().out
    assert "impl=xla integrator=" in out2 and "(resident)" not in out2
