"""Orbax checkpoint adapter (optional backend of io/checkpoint.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_tpu import SimState
from conftest import make_small_system

orbax_spec = pytest.importorskip("orbax.checkpoint")


def test_orbax_roundtrip(tmp_path):
    from nbody_tpu.io.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax)
    pos, vel, mass = make_small_system(64, seed=80)
    state = SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                     acc=jnp.zeros((64, 3), jnp.float32),
                     mass=jnp.asarray(mass))
    save_checkpoint_orbax(str(tmp_path), state, step=3)
    restored = load_checkpoint_orbax(str(tmp_path), step=3)
    np.testing.assert_array_equal(np.asarray(state.pos),
                                  np.asarray(restored.pos))
    np.testing.assert_array_equal(np.asarray(state.mass),
                                  np.asarray(restored.mass))
