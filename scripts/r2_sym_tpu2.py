"""Round-2 TPU sweep #2: turbo2 (mass-folded packs), exact-tier ablations,
1-device-mesh ring spot check, and the config-#5 live-viz fps measurement.
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def time_forces(n, variant, block_i, block_u, panel_nb, reps=6):
    """Chained force evals inside one jitted scan (pure kernel timing,
    no integrator, one device round-trip)."""
    import jax
    import jax.numpy as jnp
    from nbody_tpu.ops import forces_pallas_sym as fps

    r = np.random.default_rng(0)
    pos = jnp.asarray(r.uniform(-1e5, 1e5, (n, 3)).astype(np.float32))
    mass = jnp.asarray(r.uniform(1e5, 1e9, (n,)).astype(np.float32))

    from nbody_tpu.ops import ablation_sym
    old = fps.SYM_VARIANTS
    ablation_sym.enable()
    try:
        def chain(p):
            def body(p, _):
                acc = fps.forces_pallas_sym(
                    p, mass, 0.002, block_i=block_i, block_u=block_u,
                    panel_nb=panel_nb, variant=variant, interpret=False)
                return p + 1e-30 * acc, None
            p, _ = jax.lax.scan(body, p, None, length=reps)
            return p
        fn = jax.jit(chain)
        np.asarray(fn(pos))            # compile + warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn(pos))
            best = min(best, time.perf_counter() - t0)
        g = n * n * reps / best / 1e9
        log(f"[forces] n={n} {variant} bi={block_i} bu={block_u} "
            f"pnb={panel_nb}: {g:.1f} GInter/s-equiv "
            f"({best / reps * 1000:.2f} ms/eval)")
        return g
    finally:
        fps.SYM_VARIANTS = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="t2acc,abl,t2perf,ring1,fps")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    log(f"backend: {jax.default_backend()}")

    if "t2acc" in stages:
        # Compiled accuracy of turbo2 (mass-folded packs are in-kernel
        # derived, but verify against the platform operand bug anyway).
        try:
            import jax.numpy as jnp
            from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym
            from nbody_tpu.oracle.numpy_oracle import (
                oracle_forces, relative_mismatch)
            r = np.random.default_rng(0)
            pos = r.uniform(-1e5, 1e5, (8192, 3)).astype(np.float32)
            mass = r.uniform(1e5, 1e9, (8192,)).astype(np.float32)
            acc = np.asarray(forces_pallas_sym(
                jnp.asarray(pos), jnp.asarray(mass), 0.002, block_i=256,
                block_u=1024, variant="turbo2", interpret=False))
            ref = oracle_forces(pos, mass, 0.002)
            err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
            log(f"[t2acc] badfrac={relative_mismatch(acc, ref, .01, 1e-4).mean():.3e} "
                f"p99={np.percentile(err, 99):.3e}")
        except Exception:
            log(f"[t2acc] FAILED:\n{traceback.format_exc()}")

    if "abl" in stages:
        for variant in ("vpu", "vpu_fix0", "vpu_noj"):
            try:
                time_forces(65536, variant, 512, 1024, None)
            except Exception:
                log(f"[abl] {variant} FAILED:\n{traceback.format_exc()}")

    if "t2perf" in stages:
        for n, bi, bu, pnb in [(65536, 512, 1024, None),
                               (1 << 20, 512, 1024, 127),
                               (1 << 20, 256, 1024, 255)]:
            try:
                time_forces(n, "turbo2", bi, bu, pnb,
                            reps=6 if n == 65536 else 2)
            except Exception:
                log(f"[t2perf] FAILED:\n{traceback.format_exc()}")

    if "ring1" in stages:
        # Real-TPU 1-device-mesh spot check of the masked ring variants
        # (VERDICT task 2 done-criterion).
        try:
            import jax.numpy as jnp
            from nbody_tpu import SimConfig, SimState
            from nbody_tpu.parallel.mesh import make_mesh
            from nbody_tpu.parallel.ring import run_steps_sharded
            from nbody_tpu.oracle.numpy_oracle import (
                oracle_run, relative_mismatch)
            r = np.random.default_rng(1)
            n = 4096
            pos = r.uniform(-1e5, 1e5, (n, 3)).astype(np.float32)
            mass = r.uniform(1e5, 1e9, (n,)).astype(np.float32)
            state = SimState(pos=jnp.asarray(pos),
                             vel=jnp.zeros((n, 3), jnp.float32),
                             acc=jnp.zeros((n, 3), jnp.float32),
                             mass=jnp.asarray(mass))
            mesh = make_mesh(1)
            for impl in ("pallas_turbo", "pallas_mxu"):
                cfg = SimConfig(n_bodies=n, impl=impl, block_i=256,
                                block_j=1024)
                out = run_steps_sharded(state, cfg, mesh, 5, impl=impl)
                rpos, _, racc = oracle_run(pos, np.zeros((n, 3)), mass,
                                           cfg.eps2, cfg.dt, 5)
                bad = relative_mismatch(
                    np.asarray(out.pos), rpos, 0.01, 1.0).mean()
                log(f"[ring1] {impl}: pos badfrac={bad:.3e} "
                    f"finite={np.all(np.isfinite(np.asarray(out.pos)))}")
        except Exception:
            log(f"[ring1] FAILED:\n{traceback.format_exc()}")

    if "fps" in stages:
        # Config #5: sim + on-device render + stream to PNG at N=65536.
        try:
            from nbody_tpu import SimConfig
            from nbody_tpu.models.simulation import Simulation
            from nbody_tpu.viz.stream import FrameStreamer
            cfg = SimConfig(n_bodies=65536, impl="pallas_sym_turbo",
                            block_i=512, block_u=1024, viz_every=2)
            sim = Simulation(cfg)
            out_dir = "/tmp/fps_frames"
            # Warmup run (compiles the exact timed chunk shape).
            with FrameStreamer(out_dir) as fs:
                sim.run(n_steps=120, log_every=0, frame_streamer=fs)
            with FrameStreamer(out_dir) as fs:
                t0 = time.perf_counter()
                sim.run(n_steps=120, log_every=0, frame_streamer=fs)
                wall = time.perf_counter() - t0
                frames = fs.frames_written
            log(f"[fps] N=65536 viz_every=2: {frames} frames in "
                f"{wall:.2f}s = {frames / wall:.1f} fps "
                f"({120 / wall:.1f} steps/s)")
        except Exception:
            log(f"[fps] FAILED:\n{traceback.format_exc()}")

    log("DONE")


if __name__ == "__main__":
    sys.exit(main())
