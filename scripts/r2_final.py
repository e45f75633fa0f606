"""Round-2 final numbers: long-run (low-jitter) 65k benches, the fps
config-#5 measurement, the fixed-slot scatter ablation, and the headline
bench.py line.  Short 65k runs showed +-20% relay load jitter; these use
steps=60 / trials=3."""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    log(f"backend: {jax.default_backend()}")

    from nbody_tpu.bench_lib import run_benchmark
    for impl in ("pallas_sym", "pallas_sym_turbo"):
        try:
            res = run_benchmark(n=65536, steps=60, impl=impl, block_i=512,
                                block_u=1024, warmup_steps=3, trials=3)
            log(f"[perf65-final] {impl}: {res['value']:.1f} GInter/s "
                f"({res['ms_per_step']:.2f} ms/step)")
        except Exception:
            log(f"[perf65-final] {impl} FAILED:\n{traceback.format_exc()}")

    # Ablation: dynamic- vs fixed-slot scatter (force-only harness).
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.ops import ablation_sym
    old = fps.SYM_VARIANTS
    ablation_sym.enable()
    try:
        import jax.numpy as jnp
        r = np.random.default_rng(0)
        n = 65536
        pos = jnp.asarray(r.uniform(-1e5, 1e5, (n, 3)).astype(np.float32))
        mass = jnp.asarray(r.uniform(1e5, 1e9, (n,)).astype(np.float32))
        for variant in ("vpu", "vpu_fix0", "vpu_noj"):
            def chain(p, _v=variant):
                def body(p, _):
                    acc = fps.forces_pallas_sym(
                        p, mass, 0.002, block_i=512, block_u=1024,
                        variant=_v, interpret=False)
                    return p + 1e-30 * acc, None
                p, _ = jax.lax.scan(body, p, None, length=10)
                return p
            fn = jax.jit(chain)
            np.asarray(fn(pos))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(pos))
                best = min(best, time.perf_counter() - t0)
            log(f"[abl] {variant}: {n * n * 10 / best / 1e9:.1f} "
                f"GInter/s-equiv ({best / 10 * 1000:.2f} ms/eval)")
    except Exception:
        log(f"[abl] FAILED:\n{traceback.format_exc()}")
    finally:
        fps.SYM_VARIANTS = old

    # Config #5: fps with packed weight-map streaming.
    try:
        from nbody_tpu import SimConfig
        from nbody_tpu.models.simulation import Simulation
        from nbody_tpu.viz.stream import FrameStreamer
        for viz_every in (1, 2):
            cfg = SimConfig(n_bodies=65536, impl="pallas_sym_turbo",
                            block_i=512, block_u=1024, viz_every=viz_every)
            sim = Simulation(cfg)
            out_dir = "/tmp/fps_frames"
            with FrameStreamer(out_dir) as fs:
                sim.run(n_steps=120, log_every=0, frame_streamer=fs)
            t0 = time.perf_counter()
            with FrameStreamer(out_dir) as fs:
                sim.run(n_steps=120, log_every=0, frame_streamer=fs)
                wall_sim = time.perf_counter() - t0
            wall = time.perf_counter() - t0
            frames = 120 // viz_every
            log(f"[fps] N=65536 viz_every={viz_every}: {frames} frames; "
                f"sim+transfer {wall_sim:.2f}s = {frames / wall_sim:.1f} fps; "
                f"incl. PNG drain {wall:.2f}s = {frames / wall:.1f} fps")
    except Exception:
        log(f"[fps] FAILED:\n{traceback.format_exc()}")

    log("DONE")  # run bench.py separately afterwards (one TPU process rule)


if __name__ == "__main__":
    sys.exit(main())
