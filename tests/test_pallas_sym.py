"""Pair-symmetric (Newton's-third-law) Pallas kernels, interpret mode.

These kernels compute each unordered pair once and scatter both force
contributions (forces_pallas_sym.py) — the round-2 throughput lever.
Correctness bar: the ``vpu`` variant is EXACT-tier (same contract as the
one-sided production kernel: 0 bad components at the 1% oracle gate);
``turbo`` is the documented loose tier.

NOTE: interpret mode does not exercise the platform operand-ingestion bug
(docs/PERF.md); compiled spot-checks run on the real chip via
scripts/r2_sym_tpu.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.forces_pallas_sym import (
    _panel_layout, forces_pallas_sym)
from nbody_tpu.ops.forces_xla import forces_chunked
from nbody_tpu.oracle.numpy_oracle import (
    assert_matches_oracle, oracle_forces, relative_mismatch)
from conftest import make_small_system

EPS2 = 0.002


@pytest.mark.parametrize("n,bi,bu,pnb", [
    (384, 64, 128, None),      # single panel, nb=3 (minimum sym sweep)
    (700, 64, 128, None),      # ragged N -> ghost padding
    (2048, 128, 256, None),    # nb even -> padded to odd
    (3000, 64, 256, 5),        # multi-panel decomposition (3 panels)
    (1280, 128, 128, None),    # block_i == block_u
])
def test_sym_vpu_matches_oracle(n, bi, bu, pnb):
    pos, _, mass = make_small_system(n, seed=31)
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=bi, block_u=bu,
        panel_nb=pnb, variant="vpu"))
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(acc, ref, f"acc(sym {n})")


def test_sym_turbo_loose_tier():
    n = 2048
    pos, _, mass = make_small_system(n, seed=32)
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=128, block_u=256,
        variant="turbo"))
    ref = oracle_forces(pos, mass, EPS2)
    err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
    assert np.percentile(err, 99) < 5e-2   # documented loose contract
    # Bulk of components still inside the strict gate.
    assert relative_mismatch(acc, ref, 0.01, 1e-4).mean() < 0.1


@pytest.mark.parametrize("variant,p99_bound,badfrac_bound", [
    ("turbo2", 5e-2, 0.1),     # loose tier (bf16 inv)
    ("mxu", 5e-3, 5e-3),       # near-exact tier (hi/lo-split inv)
])
def test_sym_mxu_tiers(variant, p99_bound, badfrac_bound):
    n = 2048
    pos, _, mass = make_small_system(n, seed=37)
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=128, block_u=256,
        variant=variant))
    ref = oracle_forces(pos, mass, EPS2)
    err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
    assert np.percentile(err, 99) < p99_bound
    assert relative_mismatch(acc, ref, 0.01, 1e-4).mean() < badfrac_bound


@pytest.mark.parametrize("variant", ["vpu", "vpu2"])
@pytest.mark.parametrize("n,bi,bu,pnb", [
    (640, 64, 128, None),      # single panel, nb=5, sub=2
    (700, 64, 128, None),      # ragged N -> ghost padding
    (3000, 64, 256, 5),        # multi-panel (cross pairs via rect fold)
    (1280, 128, 128, None),    # block_i == block_u -> sub=1 classic route
])
def test_sym_fold_schedule(variant, n, bi, bu, pnb):
    """The fold grid schedule (si innermost, scratch-folded scatter) is
    the same force math as classic in a different accumulation grouping:
    it must hold the exact-tier oracle gate and agree with classic to
    reassociation rounding."""
    pos, _, mass = make_small_system(n, seed=51)
    kw = dict(block_i=bi, block_u=bu, panel_nb=pnb, variant=variant)
    a_fold = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, schedule="fold", **kw))
    a_classic = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, schedule="classic", **kw))
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(a_fold, ref, f"acc(fold {variant} {n})")
    np.testing.assert_allclose(a_fold, a_classic, rtol=1e-4, atol=1e-2)


def test_fold_schedule_resolution():
    from nbody_tpu.ops.forces_pallas_sym import resolve_schedule
    assert resolve_schedule(None, "vpu2") == "classic" or \
        resolve_schedule(None, "vpu2") == "fold"   # per-variant default
    assert resolve_schedule("fold", "vpu") == "fold"
    with pytest.raises(ValueError):
        resolve_schedule("fold", "turbo")          # VPU exact tiers only
    with pytest.raises(ValueError):
        resolve_schedule("bogus", "vpu2")


def test_rect_fold_matches_classic_and_ragged_fallback():
    from nbody_tpu.ops.forces_pallas_sym import rect_forces_sym
    na, nbods = 256, 512
    pos, _, mass = make_small_system(na + nbods, seed=52)
    pa, pb = pos[:na], pos[na:]
    ma, mb = mass[:na], mass[na:]
    args = (jnp.asarray(pa), jnp.asarray(ma), jnp.asarray(pb),
            jnp.asarray(mb), EPS2)
    # na=256 is a multiple of block_u=128: true fold path.
    f_a, f_b = rect_forces_sym(*args, block_i=64, block_u=128,
                               variant="vpu2", schedule="fold")
    c_a, c_b = rect_forces_sym(*args, block_i=64, block_u=128,
                               variant="vpu2", schedule="classic")
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(c_a),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(c_b),
                               rtol=1e-4, atol=1e-2)
    # Ragged a side (300 pads to block_i=64 only, not block_u): the fold
    # request silently takes the classic geometry fallback — same result.
    pos2, _, mass2 = make_small_system(300 + nbods, seed=53)
    args2 = (jnp.asarray(pos2[:300]), jnp.asarray(mass2[:300]),
             jnp.asarray(pos2[300:]), jnp.asarray(mass2[300:]), EPS2)
    r_a, r_b = rect_forces_sym(*args2, block_i=64, block_u=128,
                               variant="vpu2", schedule="fold")
    s_a, s_b = rect_forces_sym(*args2, block_i=64, block_u=128,
                               variant="vpu2", schedule="classic")
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(s_a))
    np.testing.assert_array_equal(np.asarray(r_b), np.asarray(s_b))


def test_fold_chunked_matches_fused():
    """Bounded-program dispatch under the fold schedule stays bit-equal
    to the fused program (same kernels, same per-slice order)."""
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym_chunked
    n = 3000
    pos, _, mass = make_small_system(n, seed=54)
    kw = dict(block_i=64, block_u=256, panel_nb=5, variant="vpu2",
              schedule="fold")
    fused = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, **kw))
    chunked = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2,
        max_prog_interactions=2.0 * (5 * 256) ** 2, **kw))
    np.testing.assert_array_equal(fused, chunked)


def test_sym_cross_checks_one_sided_pallas():
    """Two structurally different device kernels agree (the reference's
    two-kernel-family cross-check, SURVEY.md section 4)."""
    n = 1536
    pos, _, mass = make_small_system(n, seed=33)
    a_sym = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=128))
    a_xla = np.asarray(forces_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, chunk=256))
    np.testing.assert_allclose(a_sym, a_xla, rtol=1e-4, atol=1e-2)


def test_sym_momentum_closure():
    """Pair antisymmetry makes the mass-weighted force sum vanish to
    rounding: sum_i m_i a_i ~ 0 (each pair contributes m_i m_j (s - s))."""
    n = 1024
    pos, _, mass = make_small_system(n, seed=34)
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=128))
    net = np.abs((mass[:, None].astype(np.float64) * acc).sum(axis=0))
    scale = float((mass[:, None] * np.abs(acc)).sum())
    assert net.max() / scale < 1e-5


@pytest.mark.parametrize("na,nb,bi,bu,pnb", [
    (256, 256, 64, 128, None),    # equal sides, single b-panel
    (300, 180, 64, 128, None),    # ragged both sides -> ghost padding
    (128, 1500, 64, 128, 4),      # multi-panel b side (3 panels)
])
def test_rect_sym_matches_oracle(na, nb, bi, bu, pnb):
    """Cross-pair rect sweep: acc_a/acc_b must equal the oracle's cross
    contributions (full combined forces minus each side's self forces)."""
    from nbody_tpu.ops.forces_pallas_sym import rect_forces_sym
    pos, _, mass = make_small_system(na + nb, seed=41)
    pa, pb = pos[:na], pos[na:]
    ma, mb = mass[:na], mass[na:]
    acc_a, acc_b = rect_forces_sym(
        jnp.asarray(pa), jnp.asarray(ma), jnp.asarray(pb), jnp.asarray(mb),
        EPS2, block_i=bi, block_u=bu, panel_nb=pnb, variant="vpu")
    full = oracle_forces(pos, mass, EPS2)
    cross_a = full[:na] - oracle_forces(pa, ma, EPS2)
    cross_b = full[na:] - oracle_forces(pb, mb, EPS2)
    assert_matches_oracle(np.asarray(acc_a), cross_a, "acc_a(rect-sym)",
                          abs_tol=1e-4)
    assert_matches_oracle(np.asarray(acc_b), cross_b, "acc_b(rect-sym)",
                          abs_tol=1e-4)


def test_rect_sym_turbo_loose_tier():
    from nbody_tpu.ops.forces_pallas_sym import rect_forces_sym
    na = nb = 512
    pos, _, mass = make_small_system(na + nb, seed=42)
    acc_a, acc_b = rect_forces_sym(
        jnp.asarray(pos[:na]), jnp.asarray(mass[:na]),
        jnp.asarray(pos[na:]), jnp.asarray(mass[na:]),
        EPS2, block_i=64, block_u=128, variant="turbo")
    full = oracle_forces(pos, mass, EPS2)
    cross_a = full[:na] - oracle_forces(pos[:na], mass[:na], EPS2)
    err = np.abs(np.asarray(acc_a) - cross_a) / (np.abs(cross_a) + 1e-30)
    assert np.percentile(err, 99) < 5e-2


def test_rect_sym_momentum_closure():
    """N3L across two sets: m_a·acc_a sums to exactly minus m_b·acc_b up
    to rounding (every cross pair contributes equal-and-opposite terms)."""
    from nbody_tpu.ops.forces_pallas_sym import rect_forces_sym
    pos, _, mass = make_small_system(700, seed=43)
    na = 300
    acc_a, acc_b = rect_forces_sym(
        jnp.asarray(pos[:na]), jnp.asarray(mass[:na]),
        jnp.asarray(pos[na:]), jnp.asarray(mass[na:]),
        EPS2, block_i=64, block_u=128, variant="vpu")
    pa = (mass[:na, None].astype(np.float64) * np.asarray(acc_a)).sum(axis=0)
    pb = (mass[na:, None].astype(np.float64) * np.asarray(acc_b)).sum(axis=0)
    scale = float((mass[:na, None] * np.abs(np.asarray(acc_a))).sum())
    assert np.abs(pa + pb).max() / scale < 1e-5


def test_chunked_matches_single_program():
    """Multi-program dispatch (bounded program granularity for sizes whose
    fused step exceeds execution-time limits) must reproduce the fused
    result bit-for-bit at a cap that forces MANY groups."""
    from nbody_tpu.ops.forces_pallas_sym import (
        forces_pallas_sym_chunked)
    import jax.numpy as jnp2
    n = 3000   # 3 panels at panel_nb=5, block_u=256 -> 3 selfs + 3 pairs
    pos, _, mass = make_small_system(n, seed=44)
    one = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="vpu"))
    # Cap of 1 interaction: every work item lands in its own program.
    many = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="vpu", max_prog_interactions=1.0))
    np.testing.assert_array_equal(one, many)
    # And a mid cap that groups 2-3 items per program.
    mid = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="vpu", max_prog_interactions=3e6))
    np.testing.assert_array_equal(one, mid)
    del jnp2


def test_run_steps_multiprog_matches_fused():
    from nbody_tpu import SimConfig, SimState
    from nbody_tpu.ops.step import run_steps, run_steps_multiprog
    n = 1536
    pos, vel, mass = make_small_system(n, seed=45)
    state = SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                     acc=jnp.zeros((n, 3), jnp.float32),
                     mass=jnp.asarray(mass))
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=64, block_u=128,
                    panel_nb=3)
    fused = run_steps(state, cfg, 3, impl="pallas_sym")
    multi = run_steps_multiprog(state, cfg, 3, impl="pallas_sym",
                                max_prog_interactions=5e5)
    np.testing.assert_allclose(np.asarray(multi.pos), np.asarray(fused.pos),
                               rtol=1e-6, atol=1e-3)

    with pytest.raises(ValueError, match="pallas_sym"):
        run_steps_multiprog(state, cfg, 1, impl="pallas")


def test_panel_layout():
    # Single panel: nb forced odd.
    assert _panel_layout(65536, 1024, 128) == (65, 1)
    assert _panel_layout(1024, 1024, 128) == (1, 1)
    assert _panel_layout(3072, 1024, 128) == (3, 1)
    # Multi-panel: cap respected (odd), panels BALANCED so ghost padding
    # stays ~1% (cap-filling wasted 24% at N=1M), total covers N.
    for cap in (64, 127, 128, 255):
        nb, p = _panel_layout(1 << 20, 1024, cap)
        total = nb * 1024 * p
        assert nb % 2 == 1 and nb <= cap
        assert total >= (1 << 20)
        assert total <= (1 << 20) * 1.03, f"cap={cap}: {total}"
    # The search beats naive fewest-panels ceil-div where odd-nb rounding
    # is jagged: 683 blocks needed at cap 85 -> 12x57=684 (0.15% waste),
    # not 9x77=693 (+2.9% pair work; measured 314.1 vs 307.0 G/s at 1M,
    # docs/PERF.md).  nb stays >= cap//2 (sweep-efficiency floor).
    assert _panel_layout(1 << 20, 1536, 85) == (57, 12)
    # Hysteresis: extra panels need a >0.25% total-block saving — at 4M
    # the incumbent 33x83=2739 holds against 48x57=2736 (0.1% for 2.1x
    # the cross-panel pair items); at 8M 66x83=5478 beats the old
    # cap-filled 65x85=5525 but resists the pure-min 71x77=5467.
    assert _panel_layout(4 << 20, 1536, 85) == (83, 33)
    assert _panel_layout(8 << 20, 1536, 85) == (83, 66)
    assert _panel_layout(4 << 20, 2048, 64) == (57, 36)   # turbo: was 33x63
    for n in (1 << 20, 4 << 20, 8 << 20, 1 << 24, 33554432, 3_000_000):
        for bu, cap in ((1536, 85), (2048, 64)):
            nb, p = _panel_layout(n, bu, cap)
            needed = -(-n // bu)
            assert nb % 2 == 1 and nb <= cap and nb >= cap // 2
            assert nb * p >= needed
            assert nb * p <= needed * 1.005 + nb, (n, bu, cap, nb, p)


def test_sym_block_guards():
    pos, _, mass = make_small_system(256, seed=35)
    with pytest.raises(ValueError, match="multiple"):
        forces_pallas_sym(jnp.asarray(pos), jnp.asarray(mass), EPS2,
                          block_i=60, block_u=128)
    with pytest.raises(ValueError, match="multiple"):
        forces_pallas_sym(jnp.asarray(pos), jnp.asarray(mass), EPS2,
                          block_i=128, block_u=192)
    with pytest.raises(ValueError, match="VMEM"):
        forces_pallas_sym(jnp.asarray(pos), jnp.asarray(mass), EPS2,
                          block_i=1024, block_u=2048)
    with pytest.raises(ValueError, match="variant"):
        forces_pallas_sym(jnp.asarray(pos), jnp.asarray(mass), EPS2,
                          variant="warp")


def test_sym_in_step_loop():
    """impl='pallas_sym' runs through the jitted step/run_steps path."""
    from nbody_tpu import SimConfig, SimState, run_steps
    from nbody_tpu.oracle.numpy_oracle import oracle_run
    n = 512
    pos, vel, mass = make_small_system(n, seed=36)
    state = SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                     acc=jnp.zeros((n, 3), jnp.float32),
                     mass=jnp.asarray(mass))
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=64, block_u=128)
    out = run_steps(state, cfg, 10)
    rpos, rvel, _ = oracle_run(pos, vel, mass, EPS2, cfg.dt, 10)
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(sym)", abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.vel), rvel, "vel(sym)",
                          abs_tol=1e-2)


def test_resolve_block_u_variant_aware():
    from nbody_tpu.ops.forces_pallas_sym import resolve_block_u
    # Explicit value always wins.
    assert resolve_block_u(512, 1 << 20, "vpu") == 512
    # Small N: 1024 for the classic exact tier; vpu2 flips to 1536 at 65k
    # (273.0 vs 266.9 G/s, scripts/r5_smalln.py); turbo to 1536 at 65k
    # (367.0 vs 361.7 under duration-targeted trials) and 2048 from 131k.
    assert resolve_block_u(None, 65536, "vpu") == 1024
    assert resolve_block_u(None, 65536, "vpu2") == 1536
    assert resolve_block_u(None, 32768, "vpu2") == 1024
    assert resolve_block_u(None, 65536, "turbo") == 1536
    assert resolve_block_u(None, 131072, "turbo") == 2048
    assert resolve_block_u(None, 32768, "turbo") == 1024
    # Large N: exact peaks at 1536, turbo/turbo2/mxu at 2048
    # (docs/PERF.md; mxu 275.6 vs 267.0 at 1M, scripts/r5_mxu.py).
    assert resolve_block_u(None, 1 << 20, "vpu") == 1536
    assert resolve_block_u(None, 1 << 20, "mxu") == 2048
    assert resolve_block_u(None, 65536, "mxu") == 1536
    assert resolve_block_u(None, 32768, "mxu") == 1024
    assert resolve_block_u(None, 1 << 20, "turbo") == 2048
    assert resolve_block_u(None, 1 << 20, "turbo2") == 2048


def test_flat_multiprog_matches_regular():
    """The flat (>20M-body) mode must reproduce the regular multiprog loop
    exactly when fed the same flattened state."""
    import jax
    from nbody_tpu import SimConfig, SimState
    from nbody_tpu.ops.step import run_steps_multiprog, \
        run_steps_multiprog_flat
    n = 1536
    pos, vel, mass = make_small_system(n, seed=46)
    state = SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                     acc=jnp.zeros((n, 3), jnp.float32),
                     mass=jnp.asarray(mass))
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=64, block_u=128,
                    panel_nb=3, prog_cap=5e5)
    reg = run_steps_multiprog(state, cfg, 3, impl="pallas_sym")
    pf, vf, af = run_steps_multiprog_flat(
        jnp.asarray(pos).reshape(-1), jnp.asarray(vel).reshape(-1),
        jnp.zeros((3 * n,), jnp.float32), jnp.asarray(mass), cfg, 3,
        impl="pallas_sym")
    np.testing.assert_array_equal(np.asarray(pf).reshape(n, 3),
                                  np.asarray(reg.pos))
    np.testing.assert_array_equal(np.asarray(vf).reshape(n, 3),
                                  np.asarray(reg.vel))

    with pytest.raises(ValueError, match="pos_flat"):
        from nbody_tpu.ops.forces_pallas_sym import \
            forces_pallas_sym_chunked_flat
        forces_pallas_sym_chunked_flat(jnp.zeros((n, 3)),
                                       jnp.asarray(mass), 0.002)


@pytest.mark.parametrize("n,bi,bu,pnb", [
    (384, 64, 128, None),      # single panel, nb=3
    (700, 64, 128, None),      # ragged N -> ghost padding
    (3000, 64, 256, 5),        # multi-panel decomposition (3 panels)
])
def test_sym_vpu2_matches_oracle(n, bi, bu, pnb):
    """vpu2 (symmetric pair weight, 23 flops/pair) keeps the EXACT-tier
    contract: the m_i*m_j*inv reassociation + 1/m post-scale costs ~ulps,
    not accuracy class."""
    pos, _, mass = make_small_system(n, seed=31)
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=bi, block_u=bu,
        panel_nb=pnb, variant="vpu2"))
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(acc, ref, f"acc(sym2 {n})")


def test_sym_vpu2_close_to_vpu():
    """vpu2 vs vpu: same math up to reassociation — tiny relative gap."""
    n = 2048
    pos, _, mass = make_small_system(n, seed=33)
    a1 = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=128,
        block_u=256, variant="vpu"))
    a2 = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=128,
        block_u=256, variant="vpu2"))
    err = np.abs(a2 - a1) / (np.abs(a1) + 1e-30)
    assert np.percentile(err, 99) < 1e-4


def test_sym_vpu2_chunked_matches_fused():
    """The bounded dispatcher is bit-equal to the fused program for vpu2
    (the 1/m scaling happens per-slice in the same order both ways)."""
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym_chunked
    pos, _, mass = make_small_system(3000, seed=34)
    one = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="vpu2"))
    many = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="vpu2", max_prog_interactions=3e6))
    np.testing.assert_array_equal(one, many)


def test_rect_sym_vpu2_matches_oracle():
    """rect_forces_sym with vpu2 (the N3L-ring building block)."""
    from nbody_tpu.ops.forces_pallas_sym import rect_forces_sym
    pos, _, mass = make_small_system(1000, seed=35)
    na = 400
    aa, ab = rect_forces_sym(
        jnp.asarray(pos[:na]), jnp.asarray(mass[:na]),
        jnp.asarray(pos[na:]), jnp.asarray(mass[na:]), EPS2,
        block_i=64, block_u=128, variant="vpu2")
    # Oracle: cross-contributions only.
    ref = oracle_forces(pos, mass, EPS2)
    ref_self_a = oracle_forces(pos[:na], mass[:na], EPS2)
    ref_self_b = oracle_forces(pos[na:], mass[na:], EPS2)
    assert_matches_oracle(np.asarray(aa), ref[:na] - ref_self_a, "rect2 a")
    assert_matches_oracle(np.asarray(ab), ref[na:] - ref_self_b, "rect2 b")


def test_ring_sym2_matches_single_device():
    """pallas_sym2 through the sharded N3L ring on the CPU mesh."""
    import jax
    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.state import SimState
    from nbody_tpu.parallel.mesh import make_mesh
    from nbody_tpu.parallel.ring import run_steps_sharded
    from nbody_tpu.ops.step import run_steps
    n = 512
    pos, vel, mass = make_small_system(n, seed=36)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym2", block_i=8,
                    block_j=128, block_u=128)
    state = SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                     acc=jnp.zeros_like(jnp.asarray(pos)),
                     mass=jnp.asarray(mass))
    single = run_steps(state, cfg, 2, impl="pallas_sym2")
    for p in (8, 5):
        mesh = make_mesh(p)
        ringed = run_steps_sharded(state, cfg, mesh, 2, impl="pallas_sym2",
                                   comm="ring")
        err = np.abs(np.asarray(ringed.pos) - np.asarray(single.pos)) / (
            np.abs(np.asarray(single.pos)) + 1e-30)
        assert np.percentile(err, 99.9) < 1e-4, f"P={p}"


def test_sym_turbof_loose_tier():
    """turbof (symmetric bf16 weight, both matmuls from one matrix) keeps
    turbo's loose contract."""
    n = 2048
    pos, _, mass = make_small_system(n, seed=37)
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=128, block_u=256,
        variant="turbof"))
    ref = oracle_forces(pos, mass, EPS2)
    err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
    assert np.percentile(err, 99) < 5e-2
    assert relative_mismatch(acc, ref, 0.01, 1e-4).mean() < 0.1


def test_sym_turbof_multi_panel():
    pos, _, mass = make_small_system(3000, seed=38)
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="turbof"))
    ref = oracle_forces(pos, mass, EPS2)
    err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
    assert np.percentile(err, 99) < 5e-2


@pytest.mark.parametrize("n,bi,bu,pnb", [
    (1024, 64, 128, None),     # single panel: triangular turbop kernel
    (2048, 64, 128, 3),        # multi-panel: rect turbop kernels
    (700, 64, 128, None),      # ragged N -> ghost padding
])
def test_sym_turbop_bit_equals_turbo(n, bi, bu, pnb):
    """turbop (j-side accumulate chain deferred one grid step through VMEM
    scratch) is BIT-identical to turbo: same math, same per-slot add order
    — only the grid step in which each tile's j matmul+scatter executes
    moves.  Bit-equality makes turbo's oracle contract transfer whole."""
    pos, _, mass = make_small_system(n, seed=41)
    a_t = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=bi, block_u=bu,
        panel_nb=pnb, variant="turbo"))
    a_p = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=bi, block_u=bu,
        panel_nb=pnb, variant="turbop"))
    assert np.array_equal(a_t, a_p)


def test_sym_turbop_chunked_bit_equals_turbo():
    """turbop through the bounded dispatcher (the batch programs reuse the
    same _sym_call/_rect_call wrappers, so the scratch plumbing must hold
    under scan-over-dynamic-offsets too)."""
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym_chunked
    pos, _, mass = make_small_system(2048, seed=42)
    kw = dict(block_i=64, block_u=128, panel_nb=3,
              max_prog_interactions=4e5)
    a_t = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, variant="turbo", **kw))
    a_p = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, variant="turbop", **kw))
    assert np.array_equal(a_t, a_p)


def test_chunked_progress_callback():
    """The bounded dispatcher reports (done, total) after each program and the
    callback's presence must not change results (huge-N heartbeat hook)."""
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym_chunked
    n = 3000   # 12 blocks -> layout 4 panels x nb=3 -> 1 self + 6 pairs
    pos, _, mass = make_small_system(n, seed=46)
    seen = []

    def progress(done, total, acc):
        assert acc.shape == (3 * 3072,)   # padded flat accumulator
        seen.append((done, total))

    with_cb = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="vpu", max_prog_interactions=1.0,
        progress=progress))
    without = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_u=256,
        panel_nb=5, variant="vpu", max_prog_interactions=1.0))
    np.testing.assert_array_equal(with_cb, without)
    total = seen[0][1]
    assert [d for d, _ in seen] == list(range(1, total + 1))
    assert all(t == total for _, t in seen)


def test_progress_heartbeat_prints_eta():
    """Simulation.run installs the heartbeat under multiprog routing and
    prints completion-synced progress lines with an ETA."""
    import io as _io
    from nbody_tpu import SimConfig
    from nbody_tpu.io.logger import RunLogger
    from nbody_tpu.models.simulation import Simulation
    stream = _io.StringIO()
    n = 3000
    # panel_nb=3 -> 4 panels -> 1 self + 6 pair programs = 7 >= the
    # heartbeat's min_programs gate.
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=64, block_u=256,
                    panel_nb=3, prog_cap=1.0)
    sim = Simulation(cfg, logger=RunLogger(stream=stream))
    sim.progress = None   # run() installs its own
    res = sim.run(n_steps=1, log_every=0)
    assert res.steps_run == 1
    out = stream.getvalue()
    assert "force eval:" in out and "ETA" in out
    assert sim.progress is None   # uninstalled after the run
