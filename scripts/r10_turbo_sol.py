"""Round-5 turbo SOL settlement (VERDICT r4 weak #5): price the turbo
tile's MXU chain with peeling ablations and close the roofline.

The production `pallas_sym_turbo` tile is VPU pair-terms (14 f32
flops/pair) followed by two bf16 accumulate-matmuls consuming the
VPU-produced `f` in the SAME grid step; the open question from the
exact-339 and mxu-276 closures is how much tile time the matmul passes
add to the VPU floor, and whether 414.5 G/s at 1M has headroom.
(Answered by these rows + the r12 turbop experiment: the i-side matmul
is fully hidden — Mosaic pipelines it against its own producer — and
the j-side pass is 17% irreducible; see the BASELINE.md settlement.)

Chain (force-only evals, N=1M, the production 512x2048 tiles, best of 3
x 10-eval scans, device_get-timed):

  turbo (production)  - the measured headline
  tmm_full            - same math, j-positions reconstructed in-kernel
                        (delta = reconstruction cost of the ablation rig)
  tmm_noscat          - both matmuls, fixed-slot j add (delta = dynamic
                        scatter RMW)
  tmm_noj             - i-side matmul only (delta = j matmul pass)
  tmm_nomm            - pair terms + casts, no matmuls (the VPU floor —
                        the ceiling IF matmuls could overlap perfectly)

Emits JSONL rows to bench_results_r5.jsonl; the closure lands in
BASELINE.md / docs/PERF.md.  Continue-on-error per config (relay drops).
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/bench_results_r5.jsonl"


def log(msg):
    print(msg, flush=True)


def rec(**kw):
    with open(OUT, "a") as f:
        f.write(json.dumps({"script": "r10_turbo_sol", **kw}) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.ops import ablation_sym
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    ablation_sym.enable()
    assert jax.default_backend() == "tpu", "run on the real chip"

    n = 1 << 20
    bi, bu = 512, 2048
    evals = 10
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.uniform(-1e5, 1e5, (n, 3)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(1e5, 1e9, (n,)).astype(np.float32))

    for variant in ("turbo", "tmm_full", "tmm_noscat", "tmm_noj",
                    "tmm_nomm"):
        try:
            def chain(p, _v=variant):
                def body(p, _):
                    a = fps.forces_pallas_sym(
                        p, mass, 0.002, block_i=bi, block_u=bu,
                        variant=_v, interpret=False)
                    return p + 1e-30 * a, None
                p, _ = jax.lax.scan(body, p, None, length=evals)
                return p
            fn = jax.jit(chain)
            np.asarray(fn(pos))                  # compile + warmup
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(pos))
                best = min(best, time.perf_counter() - t0)
            ms = best / evals * 1e3
            gs = n * n * evals / best / 1e9
            log(f"{variant}: {gs:.1f} G/s-equiv ({ms:.2f} ms/eval)")
            rec(stage="turbo_sol", n=n, variant=variant, block_i=bi,
                block_u=bu, ginter_per_s=round(gs, 1),
                ms_per_eval=round(ms, 3))
        except Exception as e:
            log(f"{variant} FAILED: {type(e).__name__}: {str(e)[:300]}")
            traceback.print_exc()


if __name__ == "__main__":
    main()
