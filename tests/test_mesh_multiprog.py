"""Bounded-program dispatch ON A MESH (sharding x prog_cap composition).

Round-3 verdict item #1: the reference's one driver runs any configured N
(``main.cpp:142-160``); previously a mesh compiled each chip's whole force
evaluation into ONE program and warned when that program would exceed the
runtime's execution-time kill.  ``parallel/multiprog.py`` restructures the
N3L ring sweep as a host-driven sequence of compile-once
``jit(shard_map(...))`` programs, each bounded to ``prog_cap``
interactions per chip.

Correctness bar (from the verdict): a tiny forced ``prog_cap`` on the
8-virtual-device mesh must dispatch >=2 programs per chip for one step and
reproduce the unbounded mesh step BIT-EQUAL.  Bitwise identity across a
program boundary depends on XLA not fusing differently (FMA contraction
groups per program) — the geometries pinned here are measured bit-clean;
the f64-oracle gates below are geometry-independent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu import SimConfig, SimState
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.oracle.numpy_oracle import assert_matches_oracle, oracle_run
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.multiprog import (_ShardedBoundedForces,
                                          run_steps_sharded_multiprog)
from nbody_tpu.parallel.ring import run_steps_sharded
from conftest import make_small_system

GEOM = dict(block_i=8, block_j=128, block_u=128, panel_nb=2)


def make_state(n, seed=0):
    pos, vel, mass = make_small_system(n, seed=seed)
    return SimState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        acc=jnp.zeros((n, 3), jnp.float32),
        mass=jnp.asarray(mass)), pos, vel, mass


@pytest.mark.parametrize("p", [8, 5, 4, 2, 1])
def test_bounded_mesh_bitequal_fused(p):
    """Tiny cap => multiple bounded programs per chip; result BIT-EQUAL to
    the fused (unbounded) mesh step at every mesh parity.  p=8/4/2 cover
    the even-P antipodal row-split, p=5 pure odd-P, p=1 self-sweep only."""
    n, steps = 512, 3
    state, *_ = make_state(n, seed=27)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", **GEOM)
    mesh = make_mesh(p)
    calls = []
    out_mp = run_steps_sharded_multiprog(
        state, cfg, mesh, steps, impl="pallas_sym",
        max_prog_interactions=5e4,
        progress=lambda done, total, h: calls.append((done, total)))
    assert calls and calls[0][1] >= 2, "cap did not split the evaluation"
    out_f = run_steps_sharded(state, cfg, mesh, steps, impl="pallas_sym",
                              comm="ring")
    np.testing.assert_array_equal(np.asarray(out_mp.pos),
                                  np.asarray(out_f.pos))
    np.testing.assert_array_equal(np.asarray(out_mp.vel),
                                  np.asarray(out_f.vel))
    np.testing.assert_array_equal(np.asarray(out_mp.acc),
                                  np.asarray(out_f.acc))


@pytest.mark.parametrize("impl", ["pallas_sym2", "pallas_sym_turbo"])
def test_bounded_mesh_sym_variants(impl):
    """The symmetric-weight tiers ride the same bounded decomposition."""
    n, steps = 512, 2
    state, pos, vel, mass = make_state(n, seed=31)
    cfg = SimConfig(n_bodies=n, impl=impl, **GEOM)
    mesh = make_mesh(8)
    out_mp = run_steps_sharded_multiprog(
        state, cfg, mesh, steps, impl=impl, max_prog_interactions=5e4)
    out_f = run_steps_sharded(state, cfg, mesh, steps, impl=impl,
                              comm="ring")
    np.testing.assert_array_equal(np.asarray(out_mp.pos),
                                  np.asarray(out_f.pos))
    if impl == "pallas_sym2":   # exact tier gates against the oracle too
        rpos, _, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
        assert_matches_oracle(np.asarray(out_mp.pos), rpos,
                              f"pos(mesh-mp {impl})", abs_tol=1.0)


def test_bounded_mesh_matches_oracle():
    """Geometry-independent gate: f64 oracle over 3 steps on 8 chips."""
    n, steps = 512, 3
    state, pos, vel, mass = make_state(n, seed=29)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", **GEOM)
    out = run_steps_sharded_multiprog(
        state, cfg, make_mesh(8), steps, impl="pallas_sym",
        max_prog_interactions=5e4)
    rpos, rvel, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(mesh-mp)",
                          abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.acc), racc, "acc(mesh-mp)",
                          abs_tol=1e-4)


def test_bounded_mesh_kdk():
    """cfg.integrator is honored: KDK runs its 2-kick sequence with every
    force eval bounded, matching the KDK oracle twin."""
    from nbody_tpu.ops.step import prime_kdk
    n, steps = 512, 5
    state, pos, vel, mass = make_state(n, seed=30)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", integrator="kdk", **GEOM)
    state = prime_kdk(state, cfg, impl="pallas_sym")
    out = run_steps_sharded_multiprog(
        state, cfg, make_mesh(8), steps, impl="pallas_sym",
        max_prog_interactions=5e4)
    rpos, rvel, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps,
                               integrator="kdk")
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(mesh-mp kdk)",
                          abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.vel), rvel, "vel(mesh-mp kdk)",
                          abs_tol=1e-2)


def test_bounded_mesh_padding():
    """N not divisible by P: ghost padding carries the remainder."""
    n = 500
    state, pos, vel, mass = make_state(n, seed=32)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", **GEOM)
    out = run_steps_sharded_multiprog(
        state, cfg, make_mesh(8), 3, impl="pallas_sym",
        max_prog_interactions=5e4)
    assert out.n == n
    rpos, _, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, 3)
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(mesh-mp pad)",
                          abs_tol=1.0)


def test_program_count_scales_with_cap():
    """Halving the cap cannot reduce the number of bounded programs, and a
    huge cap collapses the plan to the minimum program sequence."""
    cfg = SimConfig(n_bodies=2560, impl="pallas_sym", block_i=8,
                    block_j=128, block_u=128, panel_nb=1)
    mesh = make_mesh(5)
    n_progs = [
        _ShardedBoundedForces(cfg, mesh, "pallas_sym", cap).total_programs
        for cap in (1e9, 1e5, 2e4)]
    assert n_progs[0] <= n_progs[1] <= n_progs[2]
    assert n_progs[2] > n_progs[0]


def test_bad_comm_and_impl_raise():
    state, *_ = make_state(64, seed=33)
    cfg = SimConfig(n_bodies=64, impl="pallas_sym", **GEOM)
    mesh = make_mesh(2)
    with pytest.raises(ValueError, match="ring"):
        run_steps_sharded_multiprog(state, cfg, mesh, 1, impl="pallas_sym",
                                    comm="allgather")
    with pytest.raises(ValueError, match="pallas_sym"):
        run_steps_sharded_multiprog(state, cfg, mesh, 1, impl="pallas")


def test_simulation_routes_mesh_multiprog():
    """Simulation(mesh=...) with a binding prog_cap routes through the
    bounded mesh dispatcher — the round-3 'sharded runs cannot split one
    step' warning no longer exists for sym+ring — and matches the oracle
    through the product surface."""
    import warnings
    n = 512
    state, pos, vel, mass = make_state(n, seed=34)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", prog_cap=5e4, **GEOM)
    sim = Simulation(cfg, state=state, mesh=make_mesh(8))
    assert sim._use_multiprog
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # the old path warned; this must not
        sim.run(n_steps=3)
    rpos, _, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, 3)
    assert_matches_oracle(np.asarray(sim.state.pos), rpos, "pos(sim-mesh-mp)",
                          abs_tol=1.0)


def test_simulation_mesh_default_cap_routing():
    """should_use_multiprog divides by the mesh size: a mesh whose per-chip
    share fits the default cap stays fused; single-device at the same N
    would split."""
    from nbody_tpu.ops.step import should_use_multiprog
    cfg = SimConfig(n_bodies=4_000_000, impl="pallas_sym2")
    assert should_use_multiprog(cfg, "pallas_sym2", n_devices=1)
    assert not should_use_multiprog(cfg, "pallas_sym2", n_devices=8)


def test_init_born_sharded_matches_unsharded():
    """init_state(sharding=...) generates directly into the sharded
    layout (no single-device (N,3) buffer) with IDENTICAL values — the
    PRNG stream does not depend on layout."""
    from jax.sharding import NamedSharding, PartitionSpec
    from nbody_tpu import SimConfig
    from nbody_tpu.models.init import init_state
    from nbody_tpu.parallel.mesh import SHARD_AXIS
    cfg = SimConfig(n_bodies=512, impl="pallas_sym")
    mesh = make_mesh(8)
    sh = NamedSharding(mesh, PartitionSpec(SHARD_AXIS))
    s_sharded = init_state(cfg, sharding=sh)
    s_plain = init_state(cfg)
    assert s_sharded.pos.sharding.is_equivalent_to(sh, 2)
    np.testing.assert_array_equal(np.asarray(s_sharded.pos),
                                  np.asarray(s_plain.pos))
    np.testing.assert_array_equal(np.asarray(s_sharded.mass),
                                  np.asarray(s_plain.mass))


def test_flat_scale_n_routes_to_mesh_multiprog():
    """VERDICT r3 #2 settlement: at flat-mode N (>16.7M) a mesh routes
    through sharded bounded programs on (C, 3) shards — flat + mesh is
    unnecessary because the (N,3) tiled-copy wall applies PER CHIP.
    Plan-level gate (one step at 33.5M is 1.1e15 interactions —
    infeasible off-TPU; execution mechanics are gated at small N
    above)."""
    from nbody_tpu.ops.step import should_use_flat, should_use_multiprog
    cfg = SimConfig(n_bodies=33_554_432, impl="pallas_sym2")
    mesh = make_mesh(8)
    assert should_use_flat(cfg, "pallas_sym2")          # 1 chip: flat
    assert should_use_multiprog(cfg, "pallas_sym2", n_devices=8)
    plan = _ShardedBoundedForces(cfg, mesh, "pallas_sym2", cap=1.2e13)
    assert plan.c == 33_554_432 // 8                    # (C, 3) shards
    assert plan.total_programs > 1                      # bounded split
    # Explicit flat + mesh is refused with the design rationale.
    with pytest.raises(ValueError, match="unnecessary by design"):
        Simulation(SimConfig(n_bodies=512, impl="pallas_sym",
                             flat_state=True), mesh=mesh)


def test_simulation_mesh_allgather_keeps_fused():
    """comm='allgather' has no bounded split: Simulation keeps the fused
    sharded path (and only warns if the cap actually binds)."""
    n = 512
    state, *_ = make_state(n, seed=35)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", **GEOM)
    sim = Simulation(cfg, state=state, mesh=make_mesh(8), comm="allgather")
    assert not sim._use_multiprog
    sim.run(n_steps=1)


def test_sharded_multiprog_auto_impl():
    """impl=None/'auto' resolves to the sym2 exact tier (the only family
    the bounded dispatcher serves) instead of raising on the one-sided
    local default (review r4)."""
    n = 512
    state, pos, vel, mass = make_state(n, seed=40)
    cfg = SimConfig(n_bodies=n, block_i=8, block_j=128, block_u=128,
                    prog_cap=5e4)
    mesh = make_mesh(4)
    out = run_steps_sharded_multiprog(state, cfg, mesh, 2)   # impl=None
    rpos, _, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, 2)
    assert_matches_oracle(np.asarray(out.pos), rpos,
                          "pos(multiprog auto)", abs_tol=1.0)


def test_prime_kdk_sharded_routes_through_bounded_dispatcher():
    """A binding per-chip cap routes mesh KDK priming through the bounded
    dispatcher (>=2 programs), and the primed acc matches the fused mesh
    primer bit-for-bit (same accumulation order contract as the step
    path)."""
    from nbody_tpu.parallel.multiprog import prime_kdk_sharded_multiprog
    from nbody_tpu.parallel.ring import prime_kdk_sharded
    n = 512
    state, *_ = make_state(n, seed=41)
    mesh = make_mesh(4)
    cfg_capped = SimConfig(n_bodies=n, impl="pallas_sym", block_i=8,
                           block_j=128, block_u=128, integrator="kdk",
                           prog_cap=5e4)
    progs = []
    bounded = prime_kdk_sharded(
        state, cfg_capped, mesh, impl="pallas_sym",
        progress=lambda done, total, acc: progs.append((done, total)))
    assert progs and progs[-1][1] >= 2       # the cap split the eval
    direct = prime_kdk_sharded_multiprog(state, cfg_capped, mesh,
                                         impl="pallas_sym")
    np.testing.assert_array_equal(np.asarray(bounded.acc),
                                  np.asarray(direct.acc))
