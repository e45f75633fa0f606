#!/usr/bin/env python
"""End-to-end demo: simulate, validate against the oracle, export a GIF.

Run:  python examples/demo.py [N] [STEPS]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import jax
    import nbody_tpu as nt
    from nbody_tpu.oracle.numpy_oracle import oracle_run, relative_mismatch
    from nbody_tpu.viz.gif import write_gif
    from nbody_tpu.viz.raster import render_frame

    print(f"backend: {jax.default_backend()}, N={n}, steps={steps}")
    cfg = nt.SimConfig(n_bodies=n)
    state = nt.init_state(cfg)

    # 1. Short lock-step validation vs the float64 oracle.
    out = nt.run_steps(state, cfg, 10)
    opos, _, _ = oracle_run(np.asarray(state.pos), np.asarray(state.vel),
                            np.asarray(state.mass), cfg.eps2, cfg.dt, 10)
    frac = relative_mismatch(np.asarray(out.pos), opos, 0.01, 1.0).mean()
    print(f"oracle check @10 steps: {frac:.4%} components outside 1% "
          f"({'OK' if frac < 1e-3 else 'FAIL'})")

    # 2. Trajectory with on-device snapshots -> animated GIF.
    final, snaps = nt.run_trajectory(state, cfg, steps,
                                     snap_every=max(1, steps // 50))
    frames = [np.asarray(render_frame(
        s, final.mass, cfg.min_mass, cfg.max_mass, cfg.max_view,
        width=400, height=300)) for s in snaps]
    write_gif("demo.gif", frames, delay_cs=5)
    print(f"wrote demo.gif ({len(frames)} frames)")


if __name__ == "__main__":
    main()
