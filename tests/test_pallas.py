"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU).

The reference cross-checks its two kernel families against each other and
against the CPU oracle (SURVEY.md section 4); here the Pallas kernel is the
production path and must match both the oracle and the XLA backends.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.forces_pallas import forces_pallas
from nbody_tpu.ops.forces_xla import forces_chunked
from nbody_tpu.oracle.numpy_oracle import assert_matches_oracle, oracle_forces
from conftest import make_small_system

EPS2 = 0.002


@pytest.mark.parametrize("n,bi,bj", [
    (256, 8, 128),
    (384, 8, 128),     # padding: 384 -> 512 with ghosts
    (256, 16, 256),
])
def test_pallas_vpu_matches_oracle(n, bi, bj):
    pos, _, mass = make_small_system(n, seed=10)
    acc = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=bi, block_j=bj))
    assert acc.shape == (n, 3)
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(acc, ref, "acc(pallas-vpu)")


@pytest.mark.parametrize("n,bi,bj", [(256, 8, 128), (512, 16, 256)])
def test_pallas_mxu_matches_oracle(n, bi, bj):
    pos, _, mass = make_small_system(n, seed=11)
    acc = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=bi, block_j=bj,
        use_mxu=True))
    ref = oracle_forces(pos, mass, EPS2)
    # bf16 hi/lo accumulation: ~1e-5 per-pair; a ~1e-4 fraction of strongly
    # cancelling components may exceed the strict 1% gate (measured on TPU
    # at N=8192) — tolerate that fraction.
    assert_matches_oracle(acc, ref, "acc(pallas-mxu)", max_frac_bad=1e-3)


@pytest.mark.parametrize("n,bi,bj", [(256, 8, 128), (512, 16, 256)])
def test_pallas_fast_matches_oracle_sorted(n, bi, bj):
    """Throughput-grade variant: centered MXU distances. Accuracy contract
    holds for Morton-sorted input; tolerate a tiny bad fraction (ultra-close
    pairs hit the fp32 cancellation floor)."""
    from nbody_tpu.models.ordering import morton_permutation
    pos, _, mass = make_small_system(n, seed=16)
    perm = np.asarray(morton_permutation(jnp.asarray(pos), -1e5, 1e5))
    pos, mass = pos[perm], mass[perm]
    acc = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=bi, block_j=bj,
        variant="fast"))
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(acc, ref, "acc(pallas-fast)",
                          max_frac_bad=1e-3)


def test_pallas_turbo_loose_tier():
    """Speed tier: bf16 pair forces — gate at its documented ~percent-level
    accuracy."""
    from nbody_tpu.models.ordering import morton_permutation
    pos, _, mass = make_small_system(512, seed=17)
    perm = np.asarray(morton_permutation(jnp.asarray(pos), -1e5, 1e5))
    pos, mass = pos[perm], mass[perm]
    acc = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=16, block_j=256,
        variant="turbo"))
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(acc, ref, "acc(pallas-turbo)", rel_tol=0.05,
                          abs_tol=1e-2, max_frac_bad=0.02)


def test_pallas_cross_checks_xla():
    """Two independent device implementations agree tightly."""
    pos, _, mass = make_small_system(512, seed=12)
    a_pallas = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=8, block_j=128))
    a_xla = np.asarray(
        forces_chunked(jnp.asarray(pos), jnp.asarray(mass), EPS2, chunk=128))
    np.testing.assert_allclose(a_pallas, a_xla, rtol=1e-4, atol=1e-2)


def test_pallas_autoshrink_small_n():
    """Blocks larger than N shrink instead of erroring."""
    pos, _, mass = make_small_system(64, seed=13)
    acc = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=256, block_j=1024))
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(acc, ref, "acc(pallas-small)")


def test_pallas_kahan_matches_oracle():
    """Kahan-compensated accumulation (opt-in precision tier): at least as
    accurate as plain vpu vs the f64 oracle."""
    pos, _, mass = make_small_system(1024, seed=16)
    acc = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_j=128,
        variant="vpu_kahan"))
    ref = oracle_forces(pos, mass, EPS2)
    assert_matches_oracle(acc, ref, "acc(kahan)")
    plain = np.asarray(forces_pallas(
        jnp.asarray(pos), jnp.asarray(mass), EPS2, block_i=64, block_j=128,
        variant="vpu"))
    err_k = np.abs(acc - ref).max()
    err_p = np.abs(plain - ref).max()
    assert err_k <= err_p * 1.5   # compensated sum never much worse


def test_shrink_blocks_uses_unpadded_n():
    """Regression (ADVICE round 1): shrinking must see the raw N, not the
    already-padded one, so small systems don't pad to 2048 ghosts."""
    from nbody_tpu.ops.forces_pallas import _shrink_blocks
    assert _shrink_blocks(100, 100, 512, 2048) == (64, 128)
    assert _shrink_blocks(8192, 8192, 512, 2048) == (512, 2048)


def test_pallas_vmem_budget_guard():
    """The analog of the reference's shared-memory capacity check
    (kernel.cu:637-641): oversized blocks raise before launch."""
    pos, _, mass = make_small_system(8192, seed=14)
    with pytest.raises(ValueError, match="VMEM"):
        forces_pallas(jnp.asarray(pos), jnp.asarray(mass), EPS2,
                      block_i=2048, block_j=8192)


def test_pallas_block_alignment_guard():
    pos, _, mass = make_small_system(256, seed=15)
    with pytest.raises(ValueError, match="multiple"):
        forces_pallas(jnp.asarray(pos), jnp.asarray(mass), EPS2,
                      block_i=12, block_j=128)
