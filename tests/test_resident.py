"""VMEM-resident multi-step kernel (ops/resident.py), interpret mode.

The resident kernel runs K reference-scheme steps inside one pallas_call
with the whole state in VMEM scratch.  Gates: single-step forces against
the f64 oracle (exact tier), multi-step trajectory against the standard
``run_steps`` path (same math, reassociation-level differences only over
short horizons), ghost-padding inertness, and layout-chooser contracts.

NOTE: interpret mode does not exercise the platform operand-ingestion bug
(docs/PERF.md); compiled spot-checks run on the real chip via
scripts/r6_resident.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models.init import init_state
from nbody_tpu.models.state import SimState
from nbody_tpu.ops.resident import (resident_layout, run_steps_resident)
from nbody_tpu.ops.step import run_steps
from nbody_tpu.oracle.numpy_oracle import assert_matches_oracle, oracle_forces
from conftest import make_small_system

EPS2 = 0.002


def _state(n, seed=0):
    pos, vel, mass = make_small_system(n, seed=seed)
    return SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                    acc=jnp.zeros_like(jnp.asarray(pos)),
                    mass=jnp.asarray(mass))


@pytest.mark.parametrize("n,layout", [
    (384, (3, 128, 64)),       # nb=3: minimum circular sweep
    (700, (3, 256, 128)),      # ragged N -> ghost padding
    (1280, (5, 256, 256)),     # block_i == block_u (sub=1)
    (1000, (9, 128, 64)),      # many superblocks, du=4
    (256, (1, 256, 128)),      # nb=1: diagonal-only degenerate sweep
])
def test_resident_single_step_forces_match_oracle(n, layout):
    """After ONE resident step the acc output is exactly one vpu2 force
    evaluation at the INITIAL positions (reference scheme evaluates forces
    before moving) — gate it against the f64 oracle like every exact tier."""
    st = _state(n, seed=51)
    cfg = SimConfig(n_bodies=n, eps2=EPS2)
    out = run_steps_resident(st, cfg, 1, interpret=True, layout=layout)
    ref = oracle_forces(np.asarray(st.pos), np.asarray(st.mass), EPS2)
    assert_matches_oracle(np.asarray(out.acc), ref, f"acc(resident {n})")


def test_resident_single_step_state_update_semantics():
    """pos/vel after one step follow the reference fused update
    (kernel.cu:116-124) applied to the oracle forces."""
    n = 512
    st = _state(n, seed=52)
    cfg = SimConfig(n_bodies=n, eps2=EPS2, dt=0.1)
    out = run_steps_resident(st, cfg, 1, interpret=True)
    acc = oracle_forces(np.asarray(st.pos), np.asarray(st.mass), EPS2)
    vel = np.asarray(st.vel) + 0.5 * cfg.dt * acc
    pos = np.asarray(st.pos) + cfg.dt * vel
    np.testing.assert_allclose(np.asarray(out.vel), vel, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.pos), pos, rtol=2e-4, atol=1e-2)


@pytest.mark.parametrize("n_steps", [2, 5])
def test_resident_multi_step_matches_run_steps(n_steps):
    """K resident steps track K standard-path steps (identical pair math,
    reassociation-level sum differences only, short pre-chaos horizon)."""
    n = 768
    st = _state(n, seed=53)
    cfg = SimConfig(n_bodies=n, eps2=1e6, dt=0.01, impl="xla_nxn")
    ref = run_steps(st, cfg, n_steps, impl="xla_nxn")
    out = run_steps_resident(st, cfg, n_steps, interpret=True)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-3, atol=1e-3)


def test_resident_chaining_equals_one_call():
    """Two chained resident calls (2+3 steps) equal one 5-step call exactly:
    state round-trips through HBM between calls without perturbation."""
    n = 384
    st = _state(n, seed=54)
    cfg = SimConfig(n_bodies=n, eps2=EPS2, dt=0.1)
    lay = resident_layout(n)
    a = run_steps_resident(st, cfg, 2, interpret=True, layout=lay)
    a = run_steps_resident(a, cfg, 3, interpret=True, layout=lay)
    b = run_steps_resident(st, cfg, 5, interpret=True, layout=lay)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
    np.testing.assert_array_equal(np.asarray(a.acc), np.asarray(b.acc))


def test_resident_ghosts_stay_inert():
    """Ragged N pads with zero-mass ghosts at the origin: they must not
    move, and their presence must not perturb real bodies vs a layout
    with different padding."""
    n = 700
    st = _state(n, seed=55)
    cfg = SimConfig(n_bodies=n, eps2=EPS2, dt=0.1)
    out = run_steps_resident(st, cfg, 3, interpret=True,
                             layout=(3, 256, 128))
    assert out.pos.shape == (n, 3)
    # Different padded size (9*128=1152 vs 768): real-body trajectories
    # must agree to reassociation-level tolerance.
    out2 = run_steps_resident(st, cfg, 3, interpret=True,
                              layout=(9, 128, 64))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(out2.pos),
                               rtol=1e-5, atol=1e-2)


def test_resident_layout_contracts():
    for n in (256, 4096, 8192, 12000, 16384):
        lay = resident_layout(n)
        assert lay is not None, n
        nb, bu, bi = lay
        assert nb % 2 == 1
        assert bu % 128 == 0 and bi % 8 == 0 and bu % bi == 0
        assert nb * bu >= n
    # Far beyond the VMEM budget: no layout, callers must fall back.
    assert resident_layout(10_000_000) is None


@pytest.mark.parametrize("integ", ["kdk", "yoshida4"])
def test_resident_kdk_matches_run_steps(integ):
    """KDK-composed resident steps (pre-kick/drift, sweep, post-kick per
    sub-step) track the standard step-layer composition from the same
    primed a(x_0) — identical math, reassociation-level differences."""
    from nbody_tpu.ops.step import prime_kdk
    n = 700
    cfg = SimConfig(n_bodies=n, integrator=integ, dt=0.05, seed=3)
    st = prime_kdk(_state(n, seed=3), cfg, impl="xla_nxn")
    ref = run_steps(st, cfg, 4, impl="xla_nxn")
    out = run_steps_resident(st, cfg, 4, interpret=True,
                             layout=(3, 256, 128))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=1e-3, atol=1e-5)


def test_resident_kdk_ghosts_stay_inert():
    """Zero-mass ghosts carry a=0 through the descaled acc chain: pinned
    at the origin across KDK sub-steps, real bodies unperturbed by the
    padding geometry."""
    from nbody_tpu.ops.step import prime_kdk
    n = 700
    cfg = SimConfig(n_bodies=n, integrator="yoshida4", dt=0.05, seed=5)
    st = prime_kdk(_state(n, seed=5), cfg, impl="xla_nxn")
    out = run_steps_resident(st, cfg, 3, interpret=True,
                             layout=(3, 256, 128))
    out2 = run_steps_resident(st, cfg, 3, interpret=True,
                              layout=(9, 128, 64))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(out2.pos),
                               rtol=1e-5, atol=1e-2)


def test_resident_zero_steps_is_identity():
    st = _state(256)
    cfg = SimConfig(n_bodies=256)
    out = run_steps_resident(st, cfg, 0, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(st.pos))


# --- routing (the product surface: Simulation / bench_lib / config) -----

def test_should_use_resident_contracts():
    from nbody_tpu.ops.resident import should_use_resident

    # Auto: engages for exact sym tiers + reference integrator inside the
    # measured-profitable window 2048 < N <= 8192.
    assert should_use_resident(SimConfig(n_bodies=8192), "pallas_sym2")
    assert should_use_resident(SimConfig(n_bodies=4096), "pallas_sym")
    assert should_use_resident(SimConfig(n_bodies=3072), "pallas_sym2")
    # In-window up to 16384 (cost-model layouts, scripts/r6_fair.py);
    # above the measured crossover the standard path wins.
    assert should_use_resident(SimConfig(n_bodies=12288), "pallas_sym2")
    assert should_use_resident(SimConfig(n_bodies=16384), "pallas_sym2")
    assert not should_use_resident(SimConfig(n_bodies=20480), "pallas_sym2")
    assert not should_use_resident(SimConfig(n_bodies=24576), "pallas_sym2")
    # At N <= 2048 the layout degenerates to nb=1 (diagonal-only sweep,
    # measured parity with the one-sided kernel): auto stays off, but
    # forcing still works (the nb=1 kernel is correct, just not faster).
    assert not should_use_resident(SimConfig(n_bodies=2048), "pallas_sym2")
    assert should_use_resident(
        SimConfig(n_bodies=2048, resident=True), "pallas_sym2")
    # KDK-composed schemes are in scope too (the resident KDK kernel),
    # but their window opens strictly above 3072 (the fused-sub-step
    # standard path wins at the perfect-fit 3072 — scripts/r6_fair.py).
    assert should_use_resident(
        SimConfig(n_bodies=8192, integrator="kdk"), "pallas_sym2")
    assert should_use_resident(
        SimConfig(n_bodies=4096, integrator="yoshida4"), "pallas_sym2")
    assert not should_use_resident(
        SimConfig(n_bodies=3072, integrator="yoshida4"), "pallas_sym2")
    assert should_use_resident(SimConfig(n_bodies=3072), "pallas_sym2")
    # Out of scope: dtype / impl / explicit off.
    assert not should_use_resident(
        SimConfig(n_bodies=8192, dtype="float64"), "pallas_sym2")
    assert not should_use_resident(SimConfig(n_bodies=8192), "pallas_turbo")
    assert not should_use_resident(
        SimConfig(n_bodies=8192, resident=False), "pallas_sym2")
    # Forced: wins over the crossover when feasible, raises when not.
    assert should_use_resident(
        SimConfig(n_bodies=16384, resident=True), "pallas_sym2")
    with pytest.raises(ValueError, match="out of scope"):
        should_use_resident(
            SimConfig(n_bodies=8192, resident=True, dtype="float64"),
            "pallas_sym2")
    with pytest.raises(ValueError, match="no VMEM-feasible layout"):
        should_use_resident(
            SimConfig(n_bodies=10_000_000, resident=True), "pallas_sym2")


def test_simulation_routes_resident_and_matches_run_steps():
    """Simulation at small N + exact sym impl routes chunks through the
    resident kernel; the trajectory matches the standard fused path to
    reassociation tolerance (identical pair math).

    Auto-window routing is asserted at N=3072 (construction only — an
    interpret-mode resident run at 3k is too slow for CI); the actual
    run uses a tiny forced-resident config."""
    from nbody_tpu.models.simulation import Simulation
    assert Simulation(SimConfig(n_bodies=3072, impl="pallas_sym2"))._resident
    n = 384
    cfg = SimConfig(n_bodies=n, impl="pallas_sym2", steps=4, seed=7,
                    resident=True)
    sim = Simulation(cfg)
    assert sim._resident
    res = sim.run(n_steps=4, log_every=0)
    from nbody_tpu.models.init import init_state
    ref = run_steps(init_state(cfg), cfg, 4, impl="pallas_sym2")
    np.testing.assert_allclose(np.asarray(res.state.pos),
                               np.asarray(ref.pos), rtol=1e-5, atol=1e-2)


def test_simulation_resident_off_routes_standard():
    from nbody_tpu.models.simulation import Simulation
    cfg = SimConfig(n_bodies=384, impl="pallas_sym2", resident=False)
    assert not Simulation(cfg)._resident
    # KDK integrators route too (inside the auto window, primed in
    # __init__); outside the window they stay on the standard path.
    cfg2 = SimConfig(n_bodies=384, impl="pallas_sym2", integrator="kdk")
    assert not Simulation(cfg2)._resident


def test_bench_lib_routes_resident():
    from nbody_tpu.bench_lib import run_benchmark
    r = run_benchmark(n=256, steps=2, impl="pallas_sym2", trials=1,
                      warmup_steps=1, resident=True)
    assert r["resident"] is True
    assert r["finite"]
    r2 = run_benchmark(n=256, steps=2, impl="pallas_sym2", trials=1,
                       warmup_steps=1, resident=False)
    assert r2["resident"] is False


def test_cli_resident_flag_parses():
    from nbody_tpu.cli import build_parser
    p = build_parser()
    args = p.parse_args(["run", "--n", "512", "--resident", "on"])
    assert args.resident is True
    args = p.parse_args(["bench", "--n", "512", "--resident", "off"])
    assert args.resident is False


def test_resident_yoshida4_time_reversibility():
    """The resident KDK path preserves the composition's palindromic
    structure: forward K steps, negate velocities, back K steps returns
    to the start up to f32 roundoff (the carried acceleration stays
    valid under v-negation — a(x) is velocity-independent).  The f64
    step-layer twin is tests/test_kepler.py::test_time_reversibility."""
    from nbody_tpu.ops.step import prime_kdk
    n = 384
    st = _state(n, seed=60)
    cfg = SimConfig(n_bodies=n, integrator="yoshida4", dt=0.05, eps2=1e6)
    st = prime_kdk(st, cfg, impl="xla_nxn")
    fwd = run_steps_resident(st, cfg, 8, interpret=True)
    out = run_steps_resident(fwd._replace(vel=-fwd.vel), cfg, 8,
                             interpret=True)
    err = np.max(np.abs(np.asarray(out.pos) - np.asarray(st.pos)) /
                 (np.abs(np.asarray(st.pos)) + 1.0))
    assert err < 1e-4, err


def test_forced_resident_engages_below_auto_window():
    """resident=True + impl=auto must resolve to a resident-servable impl
    at ANY small N (review r6: the redirect used to resolve 'pallas' at
    N<=2048 and the force contract errored on the impl)."""
    from nbody_tpu.models.simulation import Simulation
    from nbody_tpu.ops.forces import resolve_impl
    from nbody_tpu.ops.resident import should_use_resident
    cfg = SimConfig(n_bodies=2048, resident=True)
    impl = resolve_impl(cfg)
    assert impl == "pallas_sym2"
    assert should_use_resident(cfg, impl)
    assert Simulation(cfg)._resident
    cfg2 = SimConfig(n_bodies=2560, integrator="kdk", resident=True)
    assert resolve_impl(cfg2) == "pallas_sym2"
    assert Simulation(cfg2)._resident


def test_forced_resident_raises_when_preempted_or_infeasible():
    """resident=True promises 'forces or raises': scale options that
    preempt it (mesh/flat/prog_cap) and infeasible N must error, not
    silently fall through to another routing layer (review r6)."""
    from nbody_tpu.bench_lib import run_benchmark
    from nbody_tpu.models.simulation import Simulation
    with pytest.raises(ValueError, match="no VMEM-feasible layout"):
        Simulation(SimConfig(n_bodies=10_000_000, resident=True))
    with pytest.raises(ValueError, match="preempts"):
        Simulation(SimConfig(n_bodies=4096, resident=True, prog_cap=1e6))
    with pytest.raises(ValueError, match="preempts"):
        run_benchmark(n=256, steps=2, trials=1, warmup_steps=1,
                      resident=True, shards=2)
    with pytest.raises(ValueError, match="no VMEM-feasible layout"):
        run_benchmark(n=10_000_000, steps=2, trials=1, resident=True)


def test_forced_resident_honors_nonbinding_prog_cap():
    """A prog_cap that does NOT split one step is compatible with
    resident=True: resident chunking honors the cap via max_fused_steps,
    so routing must keep resident engaged rather than raise (ADVICE r3)."""
    from nbody_tpu.bench_lib import run_benchmark
    from nbody_tpu.models.simulation import Simulation
    cfg = SimConfig(n_bodies=2048, resident=True,
                    prog_cap=float(2048 * 2048 * 4))
    sim = Simulation(cfg)
    assert sim._resident and not sim._use_multiprog
    res = run_benchmark(n=256, steps=2, trials=1, warmup_steps=1,
                        resident=True, prog_cap=float(256 * 256 * 8))
    assert res["resident"] is True
    # A cap BELOW one step still raises (resident cannot split a step).
    with pytest.raises(ValueError, match="preempts"):
        Simulation(SimConfig(n_bodies=4096, resident=True, prog_cap=1e6))
