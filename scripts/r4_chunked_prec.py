"""Verify forces_chunked's Precision.HIGHEST fix on the real chip.

Round-3 finding: jnp.dot at Precision.DEFAULT runs bf16 multiplies on the
TPU MXU (preferred_element_type only widens the accumulator), which
measured badfrac 24% / p99 0.17 vs the f64 oracle at N=262144 — an
exact-class backend silently demoted below the turbo tier.  CPU CI can't
catch this (CPU DEFAULT is full f32), so this script re-gates the fix
compiled on TPU:

  1. N=8192: forces_chunked vs the NumPy f64 oracle (badfrac at the
     reference 1% min-magnitude gate must be 0, p99 ~1e-5).
  2. N=262144: forces_chunked vs pallas_sym2 (exact tier, p99 1.7e-6)
     — max relative component delta must sit in the f32 rounding class.

Usage: python scripts/r4_chunked_prec.py   (TPU; ~1 min)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops.forces_xla import forces_chunked
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym
    from nbody_tpu.oracle.numpy_oracle import oracle_forces
    from nbody_tpu.models.init import init_state
    from nbody_tpu.config import SimConfig

    log(f"backend: {jax.default_backend()}")

    # --- gate 1: f64 oracle at N=8192 -------------------------------------
    cfg = SimConfig(n_bodies=8192)
    st = init_state(cfg, seed=7)
    pos = np.asarray(st.pos, np.float64)
    mass = np.asarray(st.mass, np.float64)
    ref = oracle_forces(pos, mass, cfg.eps2)

    t0 = time.time()
    acc = np.asarray(forces_chunked(st.pos, st.mass, cfg.eps2, chunk=1024))
    dt = time.time() - t0
    tol = np.minimum(np.abs(acc) * 0.01, np.abs(ref) * 0.01)
    bad = (np.abs(acc - ref) > np.maximum(tol, 1e-12)).mean()
    rel = np.abs(acc - ref) / np.maximum(np.abs(ref), 1e-30)
    p99 = float(np.percentile(rel, 99))
    log(f"[8192 vs f64 oracle] badfrac={bad:.3g} p99={p99:.3g} ({dt:.1f}s)")
    ok1 = bad == 0 and p99 < 1e-3

    # --- gate 2: cross-check vs exact pallas tier at N=262144 -------------
    cfg2 = SimConfig(n_bodies=262144)
    st2 = init_state(cfg2, seed=11)
    t0 = time.time()
    a_x = np.asarray(forces_chunked(st2.pos, st2.mass, cfg2.eps2, chunk=8192))
    a_p = np.asarray(forces_pallas_sym(st2.pos, st2.mass, cfg2.eps2,
                                       variant="vpu2"))
    dt = time.time() - t0
    scale = np.maximum(np.abs(a_p), np.abs(a_x))
    rel = np.abs(a_x - a_p) / np.maximum(scale, 1e-30)
    p99 = float(np.percentile(rel, 99))
    badfrac = float((rel > 0.01).mean())
    log(f"[262144 vs pallas_sym2] badfrac(1%)={badfrac:.3g} "
        f"p99={p99:.3g} max={rel.max():.3g} ({dt:.1f}s)")
    ok2 = badfrac < 1e-5

    log("PASS" if (ok1 and ok2) else "FAIL")
    return 0 if (ok1 and ok2) else 1


if __name__ == "__main__":
    sys.exit(main())
