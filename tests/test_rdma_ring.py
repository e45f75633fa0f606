"""In-kernel RDMA ring sweep (parallel/rdma_ring.py), interpret mode on
the virtual CPU mesh.

The reference has no distributed story (single GPU, SURVEY.md section
2.3); this is the rebuild's fused compute/communication path — the whole
P-phase ring runs inside one Pallas kernel per chip, shards moving by
explicit inter-device DMA.  Correctness bar: same exact-tier oracle gates
as the ppermute ring (tests/test_ring.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu import SimConfig, SimState, run_steps
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.ring import run_steps_sharded
from nbody_tpu.oracle.numpy_oracle import assert_matches_oracle, oracle_run
from conftest import make_small_system


def make_state(n, seed=0):
    pos, vel, mass = make_small_system(n, seed=seed)
    return SimState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel),
        acc=jnp.zeros((n, 3), jnp.float32),
        mass=jnp.asarray(mass)), pos, vel, mass


@pytest.mark.parametrize("p", [8, 5, 3, 2, 1])
def test_rdma_ring_matches_oracle(p):
    """Every ring parity: P=1 degenerates to a comm-free local sweep; P=2
    exercises the peeled first/last phases with an empty middle loop; odd
    and even P >= 3 run the full double-buffered ack-gated pipeline."""
    n, steps = 512, 3
    state, pos, vel, mass = make_state(n, seed=40)
    cfg = SimConfig(n_bodies=n, impl="pallas", block_i=8, block_j=128)
    mesh = make_mesh(p)
    out = run_steps_sharded(state, cfg, mesh, steps, impl="pallas",
                            comm="rdma")
    rpos, _, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
    assert_matches_oracle(np.asarray(out.pos), rpos, f"pos(rdma p={p})",
                          abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.acc), racc, f"acc(rdma p={p})",
                          abs_tol=1e-4)


def test_rdma_matches_single_device():
    """Sharded RDMA result == single-device result within the fp32
    regrouping tolerance (phase order groups sums by source shard)."""
    n, steps = 512, 5
    state, *_ = make_state(n, seed=41)
    cfg = SimConfig(n_bodies=n, impl="pallas", block_i=8, block_j=128)
    out_sharded = run_steps_sharded(state, cfg, make_mesh(), steps,
                                    impl="pallas", comm="rdma")
    out_single = run_steps(state, cfg, steps, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_sharded.pos), np.asarray(out_single.pos),
        rtol=1e-4, atol=1.0)


def test_rdma_with_padding():
    """N not divisible by P: zero-mass ghosts ride the ring inertly."""
    n = 500
    state, pos, vel, mass = make_state(n, seed=42)
    cfg = SimConfig(n_bodies=n, impl="pallas", block_i=8, block_j=128)
    out = run_steps_sharded(state, cfg, make_mesh(), 5, impl="pallas",
                            comm="rdma")
    assert out.n == n
    rpos, _, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, 5)
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(rdma-pad)",
                          abs_tol=1.0)


def test_rdma_kdk_integrator():
    """cfg.integrator routes identically through the RDMA comm path."""
    from nbody_tpu.ops.step import prime_kdk
    n, steps = 512, 5
    state, pos, vel, mass = make_state(n, seed=43)
    cfg = SimConfig(n_bodies=n, impl="pallas", block_i=8, block_j=128,
                    integrator="kdk")
    state = prime_kdk(state, cfg, impl="pallas")
    out = run_steps_sharded(state, cfg, make_mesh(), steps, impl="pallas",
                            comm="rdma")
    rpos, rvel, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps,
                               integrator="kdk")
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(rdma-kdk)",
                          abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.vel), rvel, "vel(rdma-kdk)",
                          abs_tol=1e-2)


def test_rdma_block_u_gcd_clamp():
    """A block_u that doesn't divide the shard (run_steps_sharded pads to
    max(block_i, block_j) only — e.g. the exact tier's autotuned 1536 vs a
    2048 shard) must clamp to the gcd, not raise."""
    n = 8 * 64   # shards of 64; block_u=48 -> gcd(48, 64) = 16
    state, pos, vel, mass = make_state(n, seed=44)
    cfg = SimConfig(n_bodies=n, impl="pallas", block_i=8, block_j=64,
                    block_u=48)
    out = run_steps_sharded(state, cfg, make_mesh(), 2, impl="pallas",
                            comm="rdma")
    rpos, _, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, 2)
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(rdma-gcd)",
                          abs_tol=1.0)


def test_rdma_cli_run():
    """`nbody run --shards 8 --comm rdma` drives the RDMA ring through the
    product Simulation surface."""
    from nbody_tpu.cli import main
    rc = main(["run", "--n", "512", "--steps", "3", "--impl", "pallas",
               "--block-i", "8", "--block-j", "128", "--shards", "8",
               "--comm", "rdma", "--quiet"])
    assert rc == 0


# ---------------------------------------------------------------------------
# v2 (round 4, verdict r3 #3): HBM-resident shards, the full sym variant
# ladder over the cross-chip N3L half-ring, arbitrary shard sizes.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p", [8, 5, 2])
@pytest.mark.parametrize("impl", ["pallas_sym", "pallas_sym2"])
def test_rdma_sym_exact_tiers(p, impl):
    """Exact sym tiers through the fused N3L ring at three mesh parities:
    p=8 exercises the even-P antipodal one-sided phase, p=5 the pure
    odd-P half sweep with the direct travel-return RDMA, p=2 the
    antipodal-only degenerate ring."""
    n, steps = 512, 3
    state, pos, vel, mass = make_state(n, seed=50)
    cfg = SimConfig(n_bodies=n, impl=impl, block_i=8, block_j=32,
                    block_u=32)
    out = run_steps_sharded(state, cfg, make_mesh(p), steps, impl=impl,
                            comm="rdma")
    rpos, _, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
    assert_matches_oracle(np.asarray(out.pos), rpos,
                          f"pos(rdma-{impl} p={p})", abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.acc), racc,
                          f"acc(rdma-{impl} p={p})", abs_tol=1e-4)


@pytest.mark.parametrize("impl", ["pallas_sym_turbo", "pallas_sym_turbo2",
                                  "pallas_sym_mxu", "pallas_turbo"])
def test_rdma_variant_ladder(impl):
    """Every remaining ladder tier rides the RDMA ring at its documented
    accuracy: bf16-weight tiers gate p99 relative error, the near-exact
    mxu tier gates the oracle with a small allowance.  pallas_turbo is
    the one-sided bf16 family member (full-ring data-only payloads)."""
    n, steps = 1024, 2
    state, pos, vel, mass = make_state(n, seed=51)
    cfg = SimConfig(n_bodies=n, impl=impl, block_i=8, block_j=128,
                    block_u=128)
    out = run_steps_sharded(state, cfg, make_mesh(8), steps, impl=impl,
                            comm="rdma")
    rpos, _, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
    if impl == "pallas_sym_mxu":
        assert_matches_oracle(np.asarray(out.pos), rpos, f"pos({impl})",
                              abs_tol=1.0, max_frac_bad=2e-3)
    else:
        err = np.abs(np.asarray(out.acc) - racc) / (np.abs(racc) + 1e-30)
        assert np.percentile(err, 99) < 5e-2
        assert np.all(np.isfinite(np.asarray(out.pos)))


def test_rdma_sym_matches_ppermute_ring():
    """The fused N3L ring and the ppermute N3L ring compute the same
    physics (identical per-shard pair decomposition; summation grouping
    differs only within the fp32 contract)."""
    n, steps = 512, 5
    state, *_ = make_state(n, seed=52)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=8, block_j=128,
                    block_u=128)
    out_rdma = run_steps_sharded(state, cfg, make_mesh(5), steps,
                                 impl="pallas_sym", comm="rdma")
    out_ring = run_steps_sharded(state, cfg, make_mesh(5), steps,
                                 impl="pallas_sym", comm="ring")
    np.testing.assert_allclose(
        np.asarray(out_rdma.pos), np.asarray(out_ring.pos),
        rtol=1e-4, atol=1.0)


def test_rdma_sym_kdk():
    """cfg.integrator routes identically through the sym RDMA path."""
    from nbody_tpu.ops.step import prime_kdk
    n, steps = 512, 4
    state, pos, vel, mass = make_state(n, seed=53)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym2", block_i=8,
                    block_j=128, block_u=128, integrator="kdk")
    state = prime_kdk(state, cfg, impl="pallas_sym2")
    out = run_steps_sharded(state, cfg, make_mesh(4), steps,
                            impl="pallas_sym2", comm="rdma")
    rpos, rvel, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps,
                               integrator="kdk")
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(rdma-sym-kdk)",
                          abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.vel), rvel, "vel(rdma-sym-kdk)",
                          abs_tol=1e-2)


def test_rdma_sym_padding():
    """N not divisible by P: zero-mass ghosts ride the N3L ring inertly
    (travel-row contributions of ghosts are exactly 0)."""
    n = 500
    state, pos, vel, mass = make_state(n, seed=54)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym", block_i=8, block_j=32,
                    block_u=32)
    out = run_steps_sharded(state, cfg, make_mesh(8), 3, impl="pallas_sym",
                            comm="rdma")
    assert out.n == n
    rpos, _, _ = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, 3)
    assert_matches_oracle(np.asarray(out.pos), rpos, "pos(rdma-sym-pad)",
                          abs_tol=1.0)


def test_rdma_rejects_unsupported_impl():
    """Non-sym, non-(pallas/pallas_turbo) impls fail loudly instead of
    silently swapping accuracy class (v1 warned-and-ignored)."""
    state, *_ = make_state(64, seed=55)
    cfg = SimConfig(n_bodies=64, impl="xla", block_i=8, block_j=32)
    with pytest.raises(ValueError, match="rdma"):
        run_steps_sharded(state, cfg, make_mesh(2), 1, impl="xla",
                          comm="rdma")


@pytest.mark.parametrize("p", [8, 5, 3, 2])
def test_rdma_overlap_matches_oracle(p):
    """The overlap protocol (VERDICT r4 #7: data rows forward on receipt,
    travel rows trail one phase through the jacc workspace) at every ring
    parity, sym exact tier — same oracle bar as the sequential ring."""
    n, steps = 512, 3
    state, pos, vel, mass = make_state(n, seed=52)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym2", block_i=8, block_j=32,
                    block_u=32)
    out = run_steps_sharded(state, cfg, make_mesh(p), steps,
                            impl="pallas_sym2", comm="rdma_overlap")
    rpos, _, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
    assert_matches_oracle(np.asarray(out.pos), rpos,
                          f"pos(rdma-overlap p={p})", abs_tol=1.0)
    assert_matches_oracle(np.asarray(out.acc), racc,
                          f"acc(rdma-overlap p={p})", abs_tol=1e-4)


def test_rdma_overlap_one_sided_and_ladder():
    """One-sided family (full-ring data-only payloads) and a bf16 tier
    ride the overlap protocol at p=4 (even: antipodal pass-through)."""
    n, steps = 512, 2
    state, pos, vel, mass = make_state(n, seed=53)
    for impl, gate in (("pallas", None), ("pallas_sym_turbo", 5e-2)):
        cfg = SimConfig(n_bodies=n, impl=impl, block_i=8, block_j=128,
                        block_u=128)
        out = run_steps_sharded(state, cfg, make_mesh(4), steps, impl=impl,
                                comm="rdma_overlap")
        rpos, _, racc = oracle_run(pos, vel, mass, cfg.eps2, cfg.dt, steps)
        if gate is None:
            assert_matches_oracle(np.asarray(out.pos), rpos,
                                  f"pos(overlap-{impl})", abs_tol=1.0)
        else:
            err = (np.abs(np.asarray(out.acc) - racc)
                   / (np.abs(racc) + 1e-30))
            assert np.percentile(err, 99) < gate
            assert np.all(np.isfinite(np.asarray(out.pos)))


def test_rdma_overlap_matches_sequential_rdma():
    """Overlap vs sequential RDMA: identical physics, different (still
    deterministic) travel association order — agree to fp32 regrouping
    tolerance, and repeated overlap runs are bit-identical."""
    n, steps = 512, 3
    state, *_ = make_state(n, seed=54)
    cfg = SimConfig(n_bodies=n, impl="pallas_sym2", block_i=8, block_j=32,
                    block_u=32)
    out_seq = run_steps_sharded(state, cfg, make_mesh(5), steps,
                                impl="pallas_sym2", comm="rdma")
    out_ovl = run_steps_sharded(state, cfg, make_mesh(5), steps,
                                impl="pallas_sym2", comm="rdma_overlap")
    out_ovl2 = run_steps_sharded(state, cfg, make_mesh(5), steps,
                                 impl="pallas_sym2", comm="rdma_overlap")
    np.testing.assert_allclose(
        np.asarray(out_seq.pos), np.asarray(out_ovl.pos),
        rtol=1e-4, atol=1.0)
    np.testing.assert_array_equal(np.asarray(out_ovl.pos),
                                  np.asarray(out_ovl2.pos))
