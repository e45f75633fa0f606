"""Round-3 exact-tier tile experiment (ROADMAP 'exact-tier residual'):

1. Does the plain ``vpu`` sym kernel compile at (512, 2048) when our VMEM
   estimate is lifted and Mosaic is left as the arbiter?
2. Does the liveness-reduced ``vpu_rc`` variant (recomputed coordinate
   differences, ~3 live (BI,U) buffers instead of ~5) unlock larger
   tiles, and do they pay?

Force-only harness (10 chained evals, best of 3, device_get-timed), N=65536
and N=1M.  Continue-on-error per config (relay sessions drop mid-sweep).
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_tiles.log", "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch

    log(f"backend: {jax.default_backend()}")
    from nbody_tpu.ops import ablation_sym
    ablation_sym.enable()
    fps._VMEM_BUDGET_BYTES = 24 * 1024 * 1024   # Mosaic is the arbiter

    # Accuracy spot-check first (compiled, small N — catches the platform
    # operand bug interpret mode can't).
    rng = np.random.default_rng(5)
    n0 = 8192
    pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
    mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
    ref0 = oracle_forces(pos0, mass0, 0.002)
    try:
        acc = np.asarray(fps.forces_pallas_sym(
            jnp.asarray(pos0), jnp.asarray(mass0), 0.002,
            block_i=512, block_u=1024, variant="vpu_rc", interpret=False))
        bad = relative_mismatch(acc, ref0, 0.01, 1e-4).mean()
        log(f"[acc] vpu_rc compiled badfrac={bad:.3g}")
        if bad > 1e-6:
            log("[acc] FAIL — aborting perf sweep")
            return 1
    except Exception:
        log(f"[acc] vpu_rc compile FAILED:\n{traceback.format_exc()}")
        return 1

    configs = [
        # (variant, block_i, block_u) — (vpu, 512, 1024) is the baseline.
        ("vpu", 512, 1024),
        ("vpu", 512, 2048),
        ("vpu", 384, 2048),
        ("vpu", 512, 1536),
        ("vpu_rc", 512, 1024),
        ("vpu_rc", 512, 2048),
        ("vpu_rc", 384, 2048),
        ("vpu_rc", 256, 2048),
    ]
    for n in (65536, 1 << 20):
        pos = jnp.asarray(rng.uniform(-1e5, 1e5, (n, 3)).astype(np.float32))
        mass = jnp.asarray(rng.uniform(1e5, 1e9, (n,)).astype(np.float32))
        for variant, bi, bu in configs:
            try:
                def chain(p, _v=variant, _bi=bi, _bu=bu):
                    def body(p, _):
                        a = fps.forces_pallas_sym(
                            p, mass, 0.002, block_i=_bi, block_u=_bu,
                            variant=_v, interpret=False)
                        return p + 1e-30 * a, None
                    p, _ = jax.lax.scan(body, p, None, length=10)
                    return p
                fn = jax.jit(chain)
                np.asarray(fn(pos))            # compile + warmup
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(fn(pos))
                    best = min(best, time.perf_counter() - t0)
                gs = n * n * 10 / best / 1e9
                log(f"[tiles] n={n} {variant} ({bi},{bu}): {gs:.1f} "
                    f"GInter/s-equiv ({best / 10 * 1000:.2f} ms/eval)")
                with open("/root/repo/bench_results_r2.jsonl", "a") as f:
                    f.write(json.dumps({
                        "stage": "r3_tiles", "n": n, "variant": variant,
                        "block_i": bi, "block_u": bu,
                        "ginter_per_s": round(gs, 1),
                        "ms_per_eval": round(best / 10 * 1000, 2)}) + "\n")
            except Exception as e:
                log(f"[tiles] n={n} {variant} ({bi},{bu}) FAILED: "
                    f"{type(e).__name__}: {str(e)[:300]}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
