"""Capstone: compiled accuracy gate of the flat-layout chunked path, then
N=16.7M EXACT (one timed step, ~30 bounded programs)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_16m_exact.log", "a") as f:
        f.write(msg + "\n")

def main():
    import jax, jax.numpy as jnp
    from nbody_tpu import SimConfig, init_state
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym_chunked
    from nbody_tpu.ops.step import run_steps_multiprog
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")

    rng = np.random.default_rng(7)
    n0 = 8192
    pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
    mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
    ref0 = oracle_forces(pos0, mass0, 0.002)
    acc = np.asarray(forces_pallas_sym_chunked(
        jnp.asarray(pos0), jnp.asarray(mass0), 0.002, block_i=128,
        block_u=256, panel_nb=5, variant="vpu", max_prog_interactions=5e6))
    bad = relative_mismatch(acc, ref0, 0.01, 1e-4).mean()
    err = np.abs(acc - ref0) / (np.abs(ref0) + 1e-30)
    log(f"[acc flat] badfrac={bad:.3g} p99={np.percentile(err,99):.3g}")
    with open("/root/repo/bench_results_r3.jsonl", "a") as f:
        f.write(json.dumps({"stage": "r3_flat_acc", "n": n0,
                            "badfrac": float(bad),
                            "p99": float(np.percentile(err, 99))}) + "\n")
    if bad > 1e-6:
        log("[acc flat] FAIL — aborting 16M")
        return 1

    n = 1 << 24
    try:
        cfg = SimConfig(n_bodies=n, impl="pallas_sym")
        state = init_state(cfg)
        t0 = time.time()
        state = run_steps_multiprog(state, cfg, 1, impl="pallas_sym")
        np.asarray(state.pos[:8])
        log(f"[16M exact] compile+first step {time.time()-t0:.0f}s")
        t0 = time.time()
        state = run_steps_multiprog(state, cfg, 1, impl="pallas_sym")
        p = np.asarray(state.pos[:8])
        wall = time.time() - t0
        g = n * float(n) / wall / 1e9
        log(f"[16M exact] {wall:.1f} s/step = {g:.1f} GInter/s "
            f"finite={np.all(np.isfinite(p))}")
        with open("/root/repo/bench_results_r3.jsonl", "a") as f:
            f.write(json.dumps({"stage": "r3_scale_flat", "n": n,
                                "impl": "pallas_sym", "s_per_step": wall,
                                "ginter_per_s": g}) + "\n")
    except Exception:
        log(f"[16M exact] FAILED:\n{traceback.format_exc()[-400:]}")
    log("DONE")
    return 0

if __name__ == "__main__":
    sys.exit(main())
