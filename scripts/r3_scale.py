"""Round-3 scale records: bounded-program-granularity runs past the relay's
single-program execution kill (~60 s).

Round 2 measured N=4M only at the turbo tier (48 s/step, fused); the exact
tier (71 s/step) tripped the relay kill.  `run_steps_multiprog` /
`forces_pallas_sym_chunked` split one force evaluation into ~45 s-bounded
device programs (self-sweep program + compile-once batched cross-panel
programs), so the exact tier's 4M row — and larger N — become measurable.

Stages (continue-on-error per config; relay sessions drop mid-sweep):
  1. Compiled accuracy gate of the chunked path at N=8192 (multi-program
     forced with a tiny cap) vs the f64 oracle.
  2. N=4M exact (pallas_sym) — the round-2 "relay-killed" row.
  3. N=4M turbo via multiprog (cross-check vs the 366 fused number).
  4. N=8M turbo, then N=8M exact (stretch records).

Timing: per-step walls via device_get (block_until_ready is unreliable
through the relay); first step discarded (compile).
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
    with open("/tmp/r3_scale.log", "a") as f:
        f.write(msg + "\n")


def rec(obj):
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu import SimConfig, SimState, init_state
    from nbody_tpu.ops.step import run_steps_multiprog
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym_chunked
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    from nbody_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")

    # ---- Stage 1: compiled accuracy gate (multi-program forced) ----
    rng = np.random.default_rng(7)
    n0 = 8192
    pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
    mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
    ref0 = oracle_forces(pos0, mass0, 0.002)
    try:
        acc = np.asarray(forces_pallas_sym_chunked(
            jnp.asarray(pos0), jnp.asarray(mass0), 0.002, block_i=128,
            block_u=256, panel_nb=5, variant="vpu",
            max_prog_interactions=5e6))
        bad = relative_mismatch(acc, ref0, 0.01, 1e-4).mean()
        err = np.abs(acc - ref0) / (np.abs(ref0) + 1e-30)
        log(f"[acc] chunked compiled badfrac={bad:.3g} "
            f"p99={np.percentile(err, 99):.3g}")
        rec({"stage": "r3_scale_acc", "n": n0, "badfrac": float(bad),
             "p99": float(np.percentile(err, 99))})
        if bad > 1e-6:
            log("[acc] FAIL — aborting")
            return 1
    except Exception:
        log(f"[acc] FAILED:\n{traceback.format_exc()}")
        return 1

    # ---- Stages 2-5: scale ladder ----
    ladder = [
        (1 << 22, "pallas_sym", 2),
        (1 << 22, "pallas_sym_turbo", 2),
        (1 << 23, "pallas_sym_turbo", 1),
        (1 << 23, "pallas_sym", 1),
    ]
    for n, impl, steps in ladder:
        try:
            cfg = SimConfig(n_bodies=n, impl=impl)
            state = init_state(cfg)
            # Warm/compile step (not timed).
            t0 = time.time()
            state = run_steps_multiprog(state, cfg, 1, impl=impl)
            np.asarray(state.pos[:8])
            log(f"[{impl} n={n}] compile+first step {time.time() - t0:.0f}s")
            walls = []
            for s in range(steps):
                t0 = time.time()
                state = run_steps_multiprog(state, cfg, 1, impl=impl)
                p = np.asarray(state.pos[:8])
                walls.append(time.time() - t0)
                if not np.all(np.isfinite(p)):
                    log(f"[{impl} n={n}] NON-FINITE — aborting config")
                    raise RuntimeError("non-finite")
            best = min(walls)
            g = n * float(n) / best / 1e9
            log(f"[{impl} n={n}] best {best:.1f} s/step = {g:.1f} GInter/s "
                f"(walls: {['%.1f' % w for w in walls]})")
            rec({"stage": "r3_scale", "n": n, "impl": impl,
                 "s_per_step": best, "ginter_per_s": g,
                 "walls": [round(w, 2) for w in walls]})
        except Exception as e:
            log(f"[{impl} n={n}] FAILED: {type(e).__name__}: "
                f"{str(e)[:300]}")
            rec({"stage": "r3_scale", "n": n, "impl": impl,
                 "error": f"{type(e).__name__}: {str(e)[:200]}"})
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
