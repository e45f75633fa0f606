"""Confirm the (512,1536) tile win in the REAL bench harness (jitted
run_steps), gate accuracy, and check whether turbo shares the win."""
import json, os, sys, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_tiles2.log", "a") as f:
        f.write(msg + "\n")

def main():
    import jax, jax.numpy as jnp
    from nbody_tpu.bench_lib import run_benchmark
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    log(f"backend: {jax.default_backend()}")

    # Accuracy gate at the new geometry (compiled).
    rng = np.random.default_rng(11)
    n0 = 8192
    pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
    mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
    ref0 = oracle_forces(pos0, mass0, 0.002)
    for variant in ("vpu", "turbo"):
        acc = np.asarray(forces_pallas_sym(
            jnp.asarray(pos0), jnp.asarray(mass0), 0.002,
            block_i=512, block_u=1536, variant=variant, interpret=False))
        bad = relative_mismatch(acc, ref0, 0.01, 1e-4).mean()
        err = np.abs(acc - ref0) / (np.abs(ref0) + 1e-30)
        log(f"[acc1536] {variant}: badfrac={bad:.3g} p99={np.percentile(err,99):.3g}")

    for n, impl, bu in [(1 << 20, "pallas_sym", 1536),
                        (1 << 20, "pallas_sym", 1024),
                        (1 << 20, "pallas_sym_turbo", 1536),
                        (1 << 20, "pallas_sym_turbo", 1024),
                        (1 << 21, "pallas_sym", 1536),
                        (1 << 21, "pallas_sym_turbo", 1536)]:
        try:
            res = run_benchmark(n=n, steps=3 if n >= (1 << 21) else 5,
                                impl=impl, block_u=bu, warmup_steps=1,
                                trials=2)
            log(f"[bench] n={n} {impl} bu={bu}: {res['value']:.1f} GInter/s "
                f"({res['ms_per_step']:.1f} ms/step)")
            with open("/root/repo/bench_results_r2.jsonl", "a") as f:
                f.write(json.dumps({"stage": "r3_tiles2", "n": n,
                                    "impl": impl, "block_u": bu,
                                    "ginter_per_s": res["value"],
                                    "ms_per_step": res["ms_per_step"]}) + "\n")
        except Exception as e:
            log(f"[bench] n={n} {impl} bu={bu} FAILED: {type(e).__name__}: {str(e)[:200]}")
    log("DONE")
    return 0

if __name__ == "__main__":
    sys.exit(main())
