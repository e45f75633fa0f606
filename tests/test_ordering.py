"""Morton reordering: locality property + physics invariance."""

import numpy as np
import jax.numpy as jnp

from nbody_tpu import SimConfig, SimState, run_steps
from nbody_tpu.models.ordering import (
    apply_permutation, morton_codes, morton_sort_state)
from conftest import make_small_system


def make_state(n, seed=0):
    pos, vel, mass = make_small_system(n, seed=seed)
    return SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                    acc=jnp.zeros((n, 3), jnp.float32),
                    mass=jnp.asarray(mass))


def test_morton_codes_locality():
    """Sorted order reduces average spatial extent of index blocks."""
    state = make_state(2048, seed=50)
    sorted_state, _ = morton_sort_state(state, -1e5, 1e5)

    def mean_block_extent(pos, block=64):
        p = np.asarray(pos).reshape(-1, block, 3)
        return float(np.mean(p.max(axis=1) - p.min(axis=1)))

    before = mean_block_extent(state.pos)
    after = mean_block_extent(sorted_state.pos)
    # 2048 bodies / blocks of 64 -> 32 Z-cells; extents roughly halve
    # (ideal cubic partition would give ~1/3).
    assert after < before * 0.6, (before, after)


def test_morton_codes_known_values():
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32)
    codes = np.asarray(morton_codes(pos, 0.0, 1.0))
    assert codes[0] == 0
    assert codes[1] == (1 << 30) - 1  # all 30 bits set


def test_permutation_preserves_physics():
    """Running then sorting == sorting then running (modulo the relabeling
    permutation and fp reduction-order noise)."""
    n = 256
    state = make_state(n, seed=51)
    cfg = SimConfig(n_bodies=n, impl="xla_nxn")

    sorted_state, perm = morton_sort_state(state, -1e5, 1e5)
    out_sorted = run_steps(sorted_state, cfg, 5)
    out_plain = run_steps(state, cfg, 5)
    out_plain_permuted = apply_permutation(out_plain, perm)
    np.testing.assert_allclose(
        np.asarray(out_sorted.pos), np.asarray(out_plain_permuted.pos),
        rtol=1e-5, atol=1e-1)
    np.testing.assert_array_equal(np.asarray(out_sorted.mass),
                                  np.asarray(out_plain_permuted.mass))


def test_sort_is_stable_identity_for_sorted_input():
    state = make_state(512, seed=52)
    s1, _ = morton_sort_state(state, -1e5, 1e5)
    s2, perm2 = morton_sort_state(s1, -1e5, 1e5)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
