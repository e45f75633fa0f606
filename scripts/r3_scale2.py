"""Round-3 follow-ups: turbo tile geometry at large N, one untested exact
block_i point, and a 16.7M-body single-chip record via bounded programs.

1. turbo (512,2048) at 1M/2M — turbo's live set is smaller than exact's
   (accumulations leave the VPU), so its tile optimum may sit higher than
   the shared auto choice (1536).
2. exact (768,1536) at 1M — block_i sweep so far tested 256/512 only;
   768 needs the VMEM pre-check lifted (Mosaic is the arbiter).
3. N=16,777,216 turbo, one timed step (25 bounded programs) — scale
   record: 2.8e14 interactions/step on one chip.
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
    with open("/tmp/r3_scale2.log", "a") as f:
        f.write(msg + "\n")


def rec(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu import SimConfig, init_state
    from nbody_tpu.bench_lib import run_benchmark
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.ops.step import run_steps_multiprog
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    from nbody_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    fps._VMEM_BUDGET_BYTES = 24 * 1024 * 1024   # Mosaic is the arbiter

    # Accuracy spot for the untested (768,1536) geometry (compiled).
    rng = np.random.default_rng(13)
    n0 = 8192
    pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
    mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
    ref0 = oracle_forces(pos0, mass0, 0.002)
    try:
        acc = np.asarray(fps.forces_pallas_sym(
            jnp.asarray(pos0), jnp.asarray(mass0), 0.002,
            block_i=768, block_u=1536, variant="vpu", interpret=False))
        bad = relative_mismatch(acc, ref0, 0.01, 1e-4).mean()
        log(f"[acc768] badfrac={bad:.3g}")
        ok768 = bad < 1e-6
    except Exception as e:
        log(f"[acc768] compile FAILED: {type(e).__name__}: {str(e)[:200]}")
        ok768 = False

    cfgs = [(1 << 20, "pallas_sym_turbo", 512, 2048, 5),
            (1 << 21, "pallas_sym_turbo", 512, 2048, 3)]
    if ok768:
        cfgs.append((1 << 20, "pallas_sym", 768, 1536, 5))
    for n, impl, bi, bu, steps in cfgs:
        try:
            res = run_benchmark(n=n, steps=steps, impl=impl, block_i=bi,
                                block_u=bu, warmup_steps=1, trials=2)
            log(f"[bench] n={n} {impl} {bi}x{bu}: {res['value']:.1f} G/s "
                f"({res['ms_per_step']:.1f} ms/step)")
            rec({"stage": "r3_tiles3", "n": n, "impl": impl, "block_i": bi,
                 "block_u": bu, "ginter_per_s": res["value"],
                 "ms_per_step": res["ms_per_step"]})
        except Exception as e:
            log(f"[bench] n={n} {impl} {bi}x{bu} FAILED: "
                f"{type(e).__name__}: {str(e)[:200]}")

    # 16M record (turbo, bounded programs).
    n = 1 << 24
    try:
        cfg = SimConfig(n_bodies=n, impl="pallas_sym_turbo")
        state = init_state(cfg)
        t0 = time.time()
        state = run_steps_multiprog(state, cfg, 1, impl="pallas_sym_turbo")
        np.asarray(state.pos[:8])
        log(f"[16M] compile+first step {time.time() - t0:.0f}s")
        t0 = time.time()
        state = run_steps_multiprog(state, cfg, 1, impl="pallas_sym_turbo")
        p = np.asarray(state.pos[:8])
        wall = time.time() - t0
        g = n * float(n) / wall / 1e9
        log(f"[16M] {wall:.1f} s/step = {g:.1f} GInter/s "
            f"finite={np.all(np.isfinite(p))}")
        rec({"stage": "r3_scale", "n": n, "impl": "pallas_sym_turbo",
             "s_per_step": wall, "ginter_per_s": g})
    except Exception:
        log(f"[16M] FAILED:\n{traceback.format_exc()[-400:]}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
