"""Round-8 compiled spot-check: the RDMA ring kernel on the REAL chip.

P=1 (the only topology this relay can compile): the full fused kernel —
ANY-input ingestion of the pre-packed own payload, HBM workspace
outputs, VMEM tile streaming, transposed accumulator, in-kernel
self-pair masking for the bf16 tiers, and the P=1 return path — runs
compiled and is gated against the f64 oracle.

This is the check CLAUDE.md's convention requires for new device code
(interpret mode does NOT catch the operand-ingestion platform bug or the
Mosaic lowering rules; see docs/PERF.md).  Run after any rdma_ring.py
change and on libtpu upgrades.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu import SimConfig
from nbody_tpu.models.state import SimState
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.ring import run_steps_sharded
from nbody_tpu.oracle.numpy_oracle import oracle_run, relative_mismatch

STEPS = 5          # inside the measured clean chaos horizon


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    rng = np.random.default_rng(7)
    n = 2048
    pos = rng.uniform(-1e5, 1e5, size=(n, 3)).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    mass = rng.uniform(1e5, 1e9, size=n).astype(np.float32)
    state = SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                     acc=jnp.zeros((n, 3), jnp.float32),
                     mass=jnp.asarray(mass))
    mesh = make_mesh(1)
    rpos, _, _ = oracle_run(pos, vel, mass, 0.002, 0.1, STEPS)
    failures = 0
    for impl, gate in (("pallas", 1e-3), ("pallas_sym2", 1e-3),
                       ("pallas_sym_turbo", 5e-2)):
        cfg = SimConfig(n_bodies=n, impl=impl)
        out = run_steps_sharded(state, cfg, mesh, STEPS, impl=impl,
                                comm="rdma")
        opos = np.asarray(out.pos)
        frac = float(relative_mismatch(opos, rpos, 0.01, 1.0).mean())
        ok = np.all(np.isfinite(opos)) and frac <= gate
        failures += not ok
        print(f"{impl}: finite={bool(np.all(np.isfinite(opos)))} "
              f"mismatch_frac={frac:.3g} gate={gate} "
              f"{'PASS' if ok else 'FAIL'}")
    raise SystemExit(failures)


if __name__ == "__main__":
    main()
