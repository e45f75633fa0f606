"""Re-measure the 4M/8M ladder with the flat-layout batch programs (the
(N,3) tiled carry copies they replaced were costing compress/uncompress
time per program — 16M came in at 412.9 G/s, ABOVE 8M's 349, exposing
the overhead)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_scale4.log", "a") as f:
        f.write(msg + "\n")

def main():
    import jax
    from nbody_tpu import SimConfig, init_state
    from nbody_tpu.ops.step import run_steps_multiprog
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    for n, impl, steps in [(1 << 22, "pallas_sym", 2),
                           (1 << 22, "pallas_sym_turbo", 2),
                           (1 << 23, "pallas_sym_turbo", 1),
                           (1 << 23, "pallas_sym", 1)]:
        try:
            cfg = SimConfig(n_bodies=n, impl=impl)
            state = init_state(cfg)
            t0 = time.time()
            state = run_steps_multiprog(state, cfg, 1, impl=impl)
            np.asarray(state.pos[:8])
            log(f"[{impl} n={n}] compile+first step {time.time()-t0:.0f}s")
            walls = []
            for _ in range(steps):
                t0 = time.time()
                state = run_steps_multiprog(state, cfg, 1, impl=impl)
                p = np.asarray(state.pos[:8])
                walls.append(time.time() - t0)
                assert np.all(np.isfinite(p))
            best = min(walls)
            g = n * float(n) / best / 1e9
            log(f"[{impl} n={n}] best {best:.1f} s/step = {g:.1f} GInter/s")
            with open("/root/repo/bench_results_r3.jsonl", "a") as f:
                f.write(json.dumps({"stage": "r3_scale_flat", "n": n,
                                    "impl": impl, "s_per_step": best,
                                    "ginter_per_s": g,
                                    "walls": [round(w,2) for w in walls]}) + "\n")
        except Exception:
            log(f"[{impl} n={n}] FAILED:\n{traceback.format_exc()[-300:]}")
    log("DONE")
    return 0

if __name__ == "__main__":
    sys.exit(main())
