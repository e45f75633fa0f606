"""Round-3 continuation: narrow-operand OOM fix validation + turbo auto
tiles + bounded-program energy, on the real chip.

1. Accuracy gate: chunked multi-program at 8192 after the per-slice
   narrow-operand refactor (must stay badfrac 0).
2. turbo 65k at block_u=2048 (decides the small-N side of the
   variant-aware auto tile).
3. 4M and 8M turbo RE-runs at the new auto 2048 tiles.
4. N=16,777,216 turbo attempt (the round's OOM wall: full-length (N,1)
   mass columns lane-padded 128x; now built per panel slice).
5. total_energy_bounded spot: N=1,048,576 vs device f32 single-program
   total_energy (values must agree to f32 tolerance).
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/bench_results_r3.jsonl"


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_scale3.log", "a") as f:
        f.write(msg + "\n")


def rec(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu import SimConfig, init_state
    from nbody_tpu.bench_lib import run_benchmark
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym_chunked
    from nbody_tpu.ops.step import run_steps_multiprog
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    from nbody_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")

    # 1. accuracy gate after the operand refactor
    rng = np.random.default_rng(7)
    n0 = 8192
    pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
    mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
    ref0 = oracle_forces(pos0, mass0, 0.002)
    acc = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos0), jnp.asarray(mass0), 0.002, block_i=128,
        block_u=256, panel_nb=5, variant="vpu",
        max_prog_interactions=5e6))
    bad = relative_mismatch(acc, ref0, 0.01, 1e-4).mean()
    log(f"[acc] chunked badfrac={bad:.3g}")
    if bad > 1e-6:
        log("[acc] FAIL — aborting")
        return 1

    # 2. turbo 65k at 2048
    try:
        res = run_benchmark(n=65536, steps=60, impl="pallas_sym_turbo",
                            block_u=2048, warmup_steps=3, trials=3)
        log(f"[bench] 65k turbo 2048: {res['value']:.1f} G/s")
        rec({"stage": "r3_tiles3", "n": 65536, "impl": "pallas_sym_turbo",
             "block_u": 2048, "ginter_per_s": res["value"],
             "ms_per_step": res["ms_per_step"]})
    except Exception as e:
        log(f"[bench] 65k turbo 2048 FAILED: {str(e)[:200]}")

    # 3-4. multiprog ladder at the new auto tiles (turbo 2048)
    for n, steps in [(1 << 22, 2), (1 << 23, 1), (1 << 24, 1)]:
        impl = "pallas_sym_turbo"
        try:
            cfg = SimConfig(n_bodies=n, impl=impl)
            state = init_state(cfg)
            t0 = time.time()
            state = run_steps_multiprog(state, cfg, 1, impl=impl)
            np.asarray(state.pos[:8])
            log(f"[{impl} n={n}] compile+first step {time.time() - t0:.0f}s")
            walls = []
            for _ in range(steps):
                t0 = time.time()
                state = run_steps_multiprog(state, cfg, 1, impl=impl)
                p = np.asarray(state.pos[:8])
                walls.append(time.time() - t0)
                if not np.all(np.isfinite(p)):
                    raise RuntimeError("non-finite")
            best = min(walls)
            g = n * float(n) / best / 1e9
            log(f"[{impl} n={n}] best {best:.1f} s/step = {g:.1f} GInter/s")
            rec({"stage": "r3_scale", "n": n, "impl": impl,
                 "block_u": 2048, "s_per_step": best, "ginter_per_s": g,
                 "walls": [round(w, 2) for w in walls]})
        except Exception:
            log(f"[{impl} n={n}] FAILED:\n{traceback.format_exc()[-400:]}")
            rec({"stage": "r3_scale", "n": n, "impl": impl,
                 "block_u": 2048, "error": traceback.format_exc()[-200:]})

    # 5. bounded energy spot at 1M: vs the single-program device total
    try:
        from nbody_tpu.models.energy import total_energy, total_energy_bounded
        cfg = SimConfig(n_bodies=1 << 20)
        state = init_state(cfg)
        t0 = time.time()
        e_one = float(total_energy(state, cfg.eps2))
        t1 = time.time()
        e_bnd = total_energy_bounded(state, cfg.eps2)
        t2 = time.time()
        rel = abs(e_bnd - e_one) / abs(e_one)
        log(f"[energy 1M] single-prog {e_one:.6e} ({t1-t0:.0f}s) "
            f"bounded {e_bnd:.6e} ({t2-t1:.0f}s) rel {rel:.2e}")
        rec({"stage": "r3_energy", "n": 1 << 20, "single": e_one,
             "bounded": e_bnd, "rel": rel,
             "t_single": round(t1-t0, 1), "t_bounded": round(t2-t1, 1)})
    except Exception:
        log(f"[energy] FAILED:\n{traceback.format_exc()[-400:]}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
