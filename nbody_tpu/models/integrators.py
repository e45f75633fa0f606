"""Integration schemes.

``reference``: the exact update the reference fuses into every kernel
(``kernel.cu:116-129``, ``inter_block_reduction`` ``kernel.cu:422-435``, CPU
oracle ``validation.cpp:42-49``):

    v += 0.5 * DT * a      (half kick)
    x += DT * v            (full drift with the *updated* velocity)

Note this is *not* textbook leapfrog — only half the acceleration is ever
applied per step (SURVEY.md section 7 "Integration-scheme fidelity").  It is
reproduced exactly because it is the contract with the validation oracle.

``kdk``: correct kick-drift-kick leapfrog offered as an opt-in upgrade.  KDK
needs the acceleration at the *new* positions for the second half-kick, so it
is implemented at the step level (ops/step.py) where force evaluation is
available; here we provide the two halves.
"""

from __future__ import annotations

from typing import Tuple

import jax


def reference_update(pos: jax.Array, vel: jax.Array, acc: jax.Array,
                     dt: float) -> Tuple[jax.Array, jax.Array]:
    """Fused half-kick + drift, matching kernel.cu:116-124 exactly."""
    vel = vel + 0.5 * dt * acc
    pos = pos + dt * vel
    return pos, vel


def kdk_kick(vel: jax.Array, acc: jax.Array, dt: float) -> jax.Array:
    """Half kick of kick-drift-kick leapfrog."""
    return vel + 0.5 * dt * acc


def kdk_drift(pos: jax.Array, vel: jax.Array, dt: float) -> jax.Array:
    """Full drift of kick-drift-kick leapfrog."""
    return pos + dt * vel
