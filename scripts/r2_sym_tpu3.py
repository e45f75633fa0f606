"""Round-2 TPU sweep #3: consistent bench-harness numbers for the sym
ladder (incl. turbo2), the fixed scatter ablation, and the packed-frame
fps measurement (config #5)."""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def bench(n, impl, bi, bu, pnb, steps, warmup=2, trials=2):
    from nbody_tpu.bench_lib import run_benchmark
    res = run_benchmark(n=n, steps=steps, impl=impl, block_i=bi,
                        block_j=2048, block_u=bu, warmup_steps=warmup,
                        trials=trials, panel_nb=pnb)
    log(f"[perf] n={n} impl={impl} bi={bi} bu={bu} pnb={pnb}: "
        f"{res['value']:.1f} GInter/s ({res['ms_per_step']:.2f} ms/step, "
        f"compile {res['compile_plus_warmup_s']:.0f}s, finite={res['finite']})")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="perf,abl,fps,big")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    log(f"backend: {jax.default_backend()}")

    if "perf" in stages:
        for n, impl, bi, bu, pnb, steps in [
                (65536, "pallas_sym", 512, 1024, None, 20),
                (65536, "pallas_sym_turbo", 512, 1024, None, 20),
                (65536, "pallas_sym_turbo2", 512, 1024, None, 20),
                (65536, "pallas_sym_mxu", 512, 1024, None, 20),
                (1 << 20, "pallas_sym_turbo2", 512, 1024, 127, 3),
                (1 << 20, "pallas_sym_mxu", 512, 1024, 127, 3),
                (1 << 20, "pallas_sym", 512, 1024, 115, 3)]:
            try:
                bench(n, impl, bi, bu, pnb, steps)
            except Exception:
                log(f"[perf] {impl} n={n} FAILED:\n{traceback.format_exc()}")

    if "big" in stages:
        # Scale rows: 2M exact+turbo, and the 4M single-chip attempt that
        # round 1 could not fit under the relay's single-program limit
        # (98 s one-sided step; the sym kernels roughly halve that).
        for n, impl, steps, warm, trials in [
                (1 << 21, "pallas_sym", 2, 1, 2),
                (1 << 21, "pallas_sym_turbo", 2, 1, 2),
                (1 << 22, "pallas_sym_turbo", 1, 1, 1),
                (1 << 22, "pallas_sym", 1, 1, 1)]:
            try:
                bench(n, impl, 512, 1024, 127, steps, warmup=warm,
                      trials=trials)
            except Exception:
                log(f"[big] {impl} n={n} FAILED:\n{traceback.format_exc()}")

    if "abl" in stages:
        # Fixed-slot scatter vs dynamic-slot scatter, bench harness.
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
                    p, _ = jax.lax.scan(body, p, None, length=6)
                    return p
                fn = jax.jit(chain)
                np.asarray(fn(pos))
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    np.asarray(fn(pos))
                    best = min(best, time.perf_counter() - t0)
                log(f"[abl] {variant}: {n * n * 6 / best / 1e9:.1f} "
                    f"GInter/s-equiv ({best / 6 * 1000:.2f} ms/eval)")
        except Exception:
            log(f"[abl] FAILED:\n{traceback.format_exc()}")
        finally:
            fps.SYM_VARIANTS = old

    if "fps" in stages:
        try:
            from nbody_tpu import SimConfig
            from nbody_tpu.models.simulation import Simulation
            from nbody_tpu.viz.stream import FrameStreamer
            for viz_every in (1, 2):
                cfg = SimConfig(n_bodies=65536, impl="pallas_sym_turbo",
                                block_i=512, block_u=1024,
                                viz_every=viz_every)
                sim = Simulation(cfg)
                out_dir = "/tmp/fps_frames"
                with FrameStreamer(out_dir) as fs:
                    sim.run(n_steps=120, log_every=0, frame_streamer=fs)
                with FrameStreamer(out_dir) as fs:
                    t0 = time.perf_counter()
                    sim.run(n_steps=120, log_every=0, frame_streamer=fs)
                    wall_sim = time.perf_counter() - t0
                # close() drained the writer; total includes PNG writing.
                wall = time.perf_counter() - t0
                frames = 120 // viz_every
                log(f"[fps] N=65536 viz_every={viz_every}: {frames} frames; "
                    f"sim+transfer {wall_sim:.2f}s = {frames / wall_sim:.1f} "
                    f"fps; incl. PNG drain {wall:.2f}s = "
                    f"{frames / wall:.1f} fps")
        except Exception:
            log(f"[fps] FAILED:\n{traceback.format_exc()}")

    log("DONE")


if __name__ == "__main__":
    sys.exit(main())
