"""Flat-state (>16M-body) PRODUCT surface: the Simulation layer, CLI
routing, checkpoints, energy, rendering, and streamed trajectories must
behave identically to the regular (N, 3) path (VERDICT round 2 #1 — one
driver for any configured N, the reference bar being main.cpp:142-160).

Run at tiny N with ``flat_state=True`` forcing the layout; the layout is
a representation choice, so every result must match the regular path
bit-for-bit (same kernels, same accumulation order).
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU backend)

import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.io.logger import RunLogger
from nbody_tpu.models.simulation import Simulation

N = 1000
CFG_KW = dict(n_bodies=N, impl="pallas_sym", block_i=8, block_u=128,
              panel_nb=3, prog_cap=5e5, steps=3)


def _flat_cfg(**kw):
    return SimConfig(flat_state=True, **{**CFG_KW, **kw})


def _reg_cfg(**kw):
    return SimConfig(flat_state=False, **{**CFG_KW, **kw})


def test_should_use_flat_routing():
    from nbody_tpu.ops.step import FLAT_AUTO_THRESHOLD, should_use_flat
    assert should_use_flat(_flat_cfg(), "pallas_sym")
    assert not should_use_flat(_reg_cfg(), "pallas_sym")
    auto = SimConfig(n_bodies=N, impl="pallas_sym")
    assert not should_use_flat(auto, "pallas_sym")
    big = SimConfig(n_bodies=FLAT_AUTO_THRESHOLD + 1, impl="pallas_sym")
    assert should_use_flat(big, "pallas_sym")
    assert not should_use_flat(
        SimConfig(n_bodies=FLAT_AUTO_THRESHOLD + 1, impl="xla"), "xla")
    with pytest.raises(ValueError, match="pallas_sym"):
        should_use_flat(SimConfig(n_bodies=N, impl="xla", flat_state=True),
                        "xla")


def test_simulation_flat_matches_regular():
    """Same seed, same steps: the flat Simulation must reproduce the
    regular multiprog Simulation bit-for-bit through the PRODUCT layer."""
    sim_f = Simulation(_flat_cfg())
    sim_r = Simulation(_reg_cfg())
    assert sim_f._flat and not sim_r._flat
    res_f = sim_f.run(n_steps=3, log_every=0)
    res_r = sim_r.run(n_steps=3, log_every=0)
    pos_f = np.asarray(res_f.state.pos).reshape(-1, 3)
    assert pos_f.shape == (N, 3)
    np.testing.assert_array_equal(pos_f, np.asarray(res_r.state.pos))
    np.testing.assert_array_equal(
        np.asarray(res_f.state.vel).reshape(-1, 3),
        np.asarray(res_r.state.vel))


def test_simulation_flat_kdk_matches_regular():
    sim_f = Simulation(_flat_cfg(integrator="kdk"))
    sim_r = Simulation(_reg_cfg(integrator="kdk"))
    res_f = sim_f.run(n_steps=2, log_every=0)
    res_r = sim_r.run(n_steps=2, log_every=0)
    np.testing.assert_array_equal(
        np.asarray(res_f.state.pos).reshape(-1, 3),
        np.asarray(res_r.state.pos))


def test_flat_checkpoint_resume_roundtrip(tmp_path):
    """checkpoint from a flat run -> resume (flat) -> continue == a
    continuous flat run; and the checkpoint is (N,3)-layout on disk so
    regular-path consumers (render/analyze) read it unchanged."""
    ckpt = str(tmp_path / "flat.npz")
    sim = Simulation(_flat_cfg())
    sim.run(n_steps=2, log_every=0, checkpoint_path=ckpt)
    with np.load(ckpt) as z:
        assert z["pos"].shape == (N, 3)
        assert int(z["step"]) == 2

    resumed = Simulation.resume(ckpt, logger=RunLogger(quiet=True))
    assert resumed._flat    # saved config embeds flat_state=True
    assert resumed.step_count == 2
    res_resumed = resumed.run(n_steps=2, log_every=0)

    cont = Simulation(_flat_cfg())
    res_cont = cont.run(n_steps=4, log_every=0)
    np.testing.assert_array_equal(
        np.asarray(res_resumed.state.pos), np.asarray(res_cont.state.pos))


def test_flat_energy_matches_regular():
    from nbody_tpu.models.energy import (energy_f64, total_energy_bounded,
                                         total_energy_bounded_flat)
    sim_f = Simulation(_flat_cfg())
    sim_r = Simulation(_reg_cfg())
    e_flat = total_energy_bounded_flat(sim_f.state, 0.002,
                                       panel_bodies=384, block_i=8,
                                       block_u=128)
    e_ref = energy_f64(sim_r.state, 0.002)
    # Device-f32 accuracy class (self-term ride-along ~1e-4 at this tiny
    # N — shrinks as 1/N), same as the regular bounded path.
    e_bounded = total_energy_bounded(sim_r.state, 0.002, use_pallas=True)
    assert abs(e_bounded - e_ref) / abs(e_ref) < 1e-3
    assert abs(e_flat - e_ref) / abs(e_ref) < 1e-3
    # Deterministic across calls.
    e_flat2 = total_energy_bounded_flat(sim_f.state, 0.002,
                                        panel_bodies=384, block_i=8,
                                        block_u=128)
    assert e_flat == e_flat2
    # energy_f64 accepts FlatState directly (host conversion at small N).
    e_f64_flat = energy_f64(sim_f.state, 0.002)
    assert abs(e_f64_flat - e_ref) / abs(e_ref) < 1e-12


def test_render_weights_flat_matches_regular():
    from nbody_tpu.viz.raster import render_weights, render_weights_flat
    sim_r = Simulation(_reg_cfg())
    pos = np.asarray(sim_r.state.pos)
    mass = np.asarray(sim_r.state.mass)
    ref = np.asarray(render_weights(
        jnp.asarray(pos), jnp.asarray(mass), 1e5, 1e9, 2e5, 64, 48))
    flat = np.asarray(render_weights_flat(
        jnp.asarray(pos.reshape(-1)), jnp.asarray(mass), 1e5, 1e9, 2e5,
        64, 48, panel=256))
    np.testing.assert_array_equal(ref, flat)


def test_flat_simulation_boundary_frames(tmp_path):
    """--viz in flat mode renders boundary frames identical to the regular
    path's pixels."""
    frames = {}

    class Sink:
        frames_written = 0

        def submit(self, idx, frame):
            frames[idx] = np.asarray(frame)
            self.frames_written += 1

        def close(self):
            pass

    cfg = _flat_cfg(viz_every=1)
    sim = Simulation(cfg)
    sim.run(n_steps=2, log_every=0, frame_streamer=Sink())
    assert frames and all(f.shape == (600, 800, 3) for f in frames.values())


def test_cli_flat_run_with_services(tmp_path):
    """The VERDICT done-criterion shape: nbody run --flat-state on with
    checkpoint + JSONL logging completes through the CLI."""
    from nbody_tpu.cli import main
    ckpt = str(tmp_path / "c.npz")
    log = str(tmp_path / "log.jsonl")
    rc = main(["run", "--n", str(N), "--steps", "2", "--impl", "pallas_sym",
               "--flat-state", "on", "--block-i", "8", "--block-u", "128",
               "--prog-cap", "5e5", "--checkpoint", ckpt,
               "--log-jsonl", log, "--log-every", "1", "--quiet"])
    assert rc == 0
    assert os.path.exists(ckpt) and os.path.exists(log)
    with np.load(ckpt) as z:
        assert z["pos"].shape == (N, 3)


def test_trajectory_writer_stream_roundtrip(tmp_path):
    """Streamed trajectory == monolithic trajectory, loaded lazily."""
    from nbody_tpu.io.checkpoint import (TrajectoryWriter, LazySnapshots,
                                         load_trajectory)
    path = str(tmp_path / "traj.npz")
    rng = np.random.default_rng(0)
    snaps = rng.normal(size=(5, 17, 3)).astype(np.float32)
    mass = rng.uniform(1, 2, 17).astype(np.float32)
    with TrajectoryWriter(path, snap_every=4, mass=mass) as tw:
        for s in snaps:
            tw.append(s)
    got, got_mass, snap_every = load_trajectory(path)
    assert isinstance(got, LazySnapshots)
    assert snap_every == 4 and len(got) == 5
    assert got.shape == (5, 17, 3)
    np.testing.assert_array_equal(got_mass, mass)
    for k in range(5):
        np.testing.assert_array_equal(got[k], snaps[k])
    # Flat (3N,) appends land as (N, 3) like everything else.
    with TrajectoryWriter(path, snap_every=1) as tw:
        tw.append(snaps[0].reshape(-1))
    got2, _, _ = load_trajectory(path)
    np.testing.assert_array_equal(got2[0], snaps[0])


def test_cli_save_trajectory_streams_under_cap(tmp_path):
    """The bounded-program trajectory path streams snapshots (no host
    accumulation) and the result renders + analyzes."""
    from nbody_tpu.cli import main
    traj = str(tmp_path / "t.npz")
    rc = main(["run", "--n", str(N), "--steps", "4", "--impl", "pallas_sym",
               "--block-i", "8", "--block-u", "128", "--prog-cap", "5e5",
               "--save-trajectory", traj, "--snap-every", "2", "--quiet"])
    assert rc == 0
    from nbody_tpu.io.checkpoint import load_trajectory
    snaps, mass, snap_every = load_trajectory(traj)
    assert len(snaps) == 2 and snap_every == 2
    assert mass is not None and mass.shape == (N,)
    out = str(tmp_path / "frames")
    rc = main(["render", traj, "--out-dir", out, "--width", "64",
               "--height", "48"])
    assert rc == 0
    assert len(os.listdir(out)) == 2
    rc = main(["analyze", traj, "--bins", "8", "--json"])
    assert rc == 0


def test_flat_trajectory_capture_cli(tmp_path):
    """Flat-mode --save-trajectory: snapshots stream and match the regular
    path bit-for-bit."""
    from nbody_tpu.cli import main
    from nbody_tpu.io.checkpoint import load_trajectory
    t_flat = str(tmp_path / "flat.npz")
    t_reg = str(tmp_path / "reg.npz")
    common = ["run", "--n", str(N), "--steps", "4", "--impl", "pallas_sym",
              "--block-i", "8", "--block-u", "128", "--prog-cap", "5e5",
              "--snap-every", "2", "--quiet"]
    assert main(common + ["--flat-state", "on",
                          "--save-trajectory", t_flat]) == 0
    assert main(common + ["--flat-state", "off",
                          "--save-trajectory", t_reg]) == 0
    sf, _, _ = load_trajectory(t_flat)
    sr, _, _ = load_trajectory(t_reg)
    assert len(sf) == len(sr) == 2
    for k in range(2):
        np.testing.assert_array_equal(sf[k], sr[k])


def test_cli_flat_resume(tmp_path):
    """CLI --resume restores a flat run through the metadata-first path
    and continues bit-identically to an uninterrupted run."""
    from nbody_tpu.cli import main
    ckpt = str(tmp_path / "r.npz")
    common = ["--n", str(N), "--impl", "pallas_sym", "--flat-state", "on",
              "--block-i", "8", "--block-u", "128", "--prog-cap", "5e5",
              "--quiet"]
    assert main(["run", "--steps", "2", "--checkpoint", ckpt] + common) == 0
    assert main(["run", "--resume", ckpt, "--steps", "2",
                 "--checkpoint", ckpt] + common) == 0
    cont = Simulation(_flat_cfg())
    res = cont.run(n_steps=4, log_every=0)
    with np.load(ckpt) as z:
        assert int(z["step"]) == 4
        np.testing.assert_array_equal(
            z["pos"], np.asarray(res.state.pos).reshape(-1, 3))


def test_resume_flat_checkpoint_with_mesh(tmp_path):
    """A flat-run checkpoint resumed onto a mesh must load the (N, 3)
    layout (the sharded path consumes (N,3) shards; flat is single-device
    only) — mesh is threaded into resume, not attached after."""
    from nbody_tpu.parallel.mesh import make_mesh
    ckpt = str(tmp_path / "f.npz")
    Simulation(_flat_cfg(block_j=128)).run(
        n_steps=1, log_every=0, checkpoint_path=ckpt)
    sim = Simulation.resume(ckpt, logger=RunLogger(quiet=True),
                            mesh=make_mesh(2))
    assert not sim._flat
    assert sim.state.pos.ndim == 2
    res = sim.run(n_steps=1, log_every=0)
    assert res.steps_run == 1


def test_flat_state_into_non_flat_simulation_converts():
    """A FlatState handed to a Simulation whose routing is non-flat is
    converted host-side instead of crashing deep in kernel dispatch."""
    from nbody_tpu.models.init import init_state_flat
    flat = init_state_flat(_flat_cfg())
    sim = Simulation(_reg_cfg(), state=flat)
    assert sim.state.pos.ndim == 2
    res = sim.run(n_steps=1, log_every=0)
    assert res.steps_run == 1


def test_trajectory_writer_discards_on_exception(tmp_path):
    """A failure mid-stream must NOT commit over a previous complete
    trajectory (atomic tmp+rename semantics; review r4)."""
    import pytest
    from nbody_tpu.io.checkpoint import TrajectoryWriter, load_trajectory
    path = str(tmp_path / "traj.npz")
    full = np.arange(2 * 6 * 3, dtype=np.float32).reshape(2, 6, 3)
    with TrajectoryWriter(path, snap_every=1) as tw:
        for s in full:
            tw.append(s)
    with pytest.raises(RuntimeError, match="mid-run"):
        with TrajectoryWriter(path, snap_every=1) as tw:
            tw.append(full[0])
            raise RuntimeError("mid-run relay drop")
    # Destination still holds BOTH snapshots of the committed run, and
    # the tmp file is gone.
    got, _, _ = load_trajectory(path)
    assert len(got) == 2
    assert not [f for f in os.listdir(tmp_path) if "tmp" in f]


def test_load_trajectory_snap_count_fallback(tmp_path):
    """Without an n_snaps entry the fallback count must not mistake the
    'snap_every' metadata entry for a snapshot (review r4)."""
    from nbody_tpu.io.checkpoint import load_trajectory
    path = str(tmp_path / "traj.npz")
    np.savez(path,
             snap_000000=np.zeros((4, 3), np.float32),
             snap_000001=np.ones((4, 3), np.float32),
             snap_every=np.asarray(2, dtype=np.int64))
    got, _, snap_every = load_trajectory(path)
    assert len(got) == 2 and snap_every == 2
    np.testing.assert_array_equal(got[1], np.ones((4, 3), np.float32))


def test_simulation_flat_yoshida4_matches_regular():
    """yoshida4's sub-step loop is elementwise + force sweeps, so the flat
    layout must reproduce the regular path bit-for-bit too."""
    sim_f = Simulation(_flat_cfg(integrator="yoshida4"))
    sim_r = Simulation(_reg_cfg(integrator="yoshida4"))
    res_f = sim_f.run(n_steps=2, log_every=0)
    res_r = sim_r.run(n_steps=2, log_every=0)
    np.testing.assert_array_equal(
        np.asarray(res_f.state.pos).reshape(-1, 3),
        np.asarray(res_r.state.pos))
