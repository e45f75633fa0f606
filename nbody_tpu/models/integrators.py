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

``yoshida4``: 4th-order symplectic integrator (Yoshida 1990, Phys. Lett. A
150:262 — "Construction of higher order symplectic integrators"): one step
is a composition of three KDK sub-steps with sub-timesteps ``w1*dt, w0*dt,
w1*dt`` where ``w1 = 1/(2 - 2^(1/3))`` and ``w0 = 1 - 2*w1 < 0`` (the
middle sub-step runs *backward*).  Three force evaluations per step buy two
extra orders of accuracy — verified at its theoretical order by the
closed-form Kepler gates (tests/test_kepler.py).  The reference has nothing
like it; it exists because the step layer composes integrators from
functional pieces, so higher-order schemes are a coefficient table, not a
new kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax


# Yoshida-4 composition weights (w1, w0, w1); sum is exactly 1.
_CBRT2 = 2.0 ** (1.0 / 3.0)
YOSHIDA4_W1 = 1.0 / (2.0 - _CBRT2)
YOSHIDA4_W0 = 1.0 - 2.0 * YOSHIDA4_W1
YOSHIDA4_WEIGHTS = (YOSHIDA4_W1, YOSHIDA4_W0, YOSHIDA4_W1)

# Sub-step weight table per integrator: each entry is one KDK sub-step of
# weight*dt, chained through the force evaluation of the step layer.
KDK_WEIGHTS = {"kdk": (1.0,), "yoshida4": YOSHIDA4_WEIGHTS}


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
