"""Round-5 turbop measurement: does deferring the j-side accumulate chain
one grid step let Mosaic overlap it with the VPU wavefront?

The r10 peeling ablations (BASELINE.md turbo-SOL settlement) priced
turbo's j-side pass at 17% of tile time and identified a ~473 G/s
ceiling IF the chain could ride like the (fully hidden) i-side matmul.
`turbop` (ops/forces_pallas_sym.py) is that experiment: the tile's
bf16(fj) / xi8 / xjT go to VMEM scratch and the sublane-contracted
matmul + dynamic-offset scatter execute at the top of the NEXT grid
step, dependency-free against that step's VPU pair terms.  Outcomes:

  ~turbo   -> the j-pass cost is irreducible vector-unit issue slots
              (the bf16 cast and the implicit operand relayout both
              occupy the VPU/XLU in-stream) — settlement: 409-415 is
              the formulation ceiling.
  >> turbo -> Mosaic overlaps the deferred chain — promote turbop.

Protocol (r10's): force-only 10-eval scans at N=1M, device_get-timed,
best of 3.  turbop's scratch shrinks the VMEM panel budget at U=2048
(panel_nb<=25 vs the default 63), so every 2048 row runs BOTH variants
at the SAME panel_nb — panel geometry is a measured 2-8% effect and
must not pollute the comparison.  U=1536 fits the default panels, so
that pair runs at defaults.  A turbo2 row at 2048 re-tests the round-2
"mass-folded packs lose 36%" result at the production tile (the
dual-layout hypothesis: weight matrices feeding BOTH a lane- and a
sublane-contraction need two MXU latch layouts).

Also compiled-accuracy gate: turbop vs turbo on-chip (bit-equality is
the contract; the interpret gate is tests/test_pallas_sym.py).

Emits JSONL rows to bench_results_r5.jsonl; continue-on-error per row
(relay drops).
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
        f.write(json.dumps({"script": "r12_jpipe", **kw}) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "run on the real chip"

    n = 1 << 20
    evals = 10
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.uniform(-1e5, 1e5, (n, 3)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(1e5, 1e9, (n,)).astype(np.float32))

    # Compiled-accuracy gate first (small N so it is cheap): turbop must
    # be bit-identical to turbo ON THE CHIP, not just in interpret mode.
    try:
        kw = dict(block_i=128, block_u=256, panel_nb=3)
        a_t = np.asarray(fps.forces_pallas_sym(
            pos[:4096], mass[:4096], 0.002, variant="turbo", **kw))
        a_p = np.asarray(fps.forces_pallas_sym(
            pos[:4096], mass[:4096], 0.002, variant="turbop", **kw))
        bits = bool(np.array_equal(a_t, a_p))
        p99 = float(np.percentile(
            np.abs(a_p - a_t) / (np.abs(a_t) + 1e-30), 99))
        log(f"chip gate: bit_equal={bits} p99_vs_turbo={p99:.2e}")
        rec(stage="gate", n=4096, bit_equal=bits, p99_vs_turbo=p99)
        if not bits and p99 > 1e-6:
            log("GATE FAILED — not bit-equal on chip; measuring anyway")
    except Exception:
        traceback.print_exc()

    rows = [
        ("turbo", 512, 2048, 25),
        ("turbop", 512, 2048, 25),
        ("turbo", 512, 1536, None),
        ("turbop", 512, 1536, None),
        ("turbo2", 512, 2048, None),
    ]
    for variant, bi, bu, pnb in rows:
        try:
            def chain(p, _v=variant, _bi=bi, _bu=bu, _pnb=pnb):
                def body(p, _):
                    a = fps.forces_pallas_sym(
                        p, mass, 0.002, block_i=_bi, block_u=_bu,
                        panel_nb=_pnb, variant=_v, interpret=False)
                    return p + 1e-30 * a, None
                p, _ = jax.lax.scan(body, p, None, length=evals)
                return p
            fn = jax.jit(chain)
            t0 = time.perf_counter()
            np.asarray(fn(pos))                  # compile + warmup
            warm = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(pos))
                best = min(best, time.perf_counter() - t0)
            ms = best / evals * 1e3
            gs = n * n * evals / best / 1e9
            log(f"{variant} {bi}x{bu} pnb={pnb}: {gs:.1f} G/s "
                f"({ms:.2f} ms/eval, warm {warm:.0f}s)")
            rec(stage="jpipe", n=n, variant=variant, block_i=bi,
                block_u=bu, panel_nb=pnb, ginter_per_s=round(gs, 1),
                ms_per_eval=round(ms, 3), warmup_s=round(warm, 1))
        except Exception as e:
            log(f"{variant} {bi}x{bu} pnb={pnb} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
            traceback.print_exc()
            rec(stage="jpipe", n=n, variant=variant, block_i=bi,
                block_u=bu, panel_nb=pnb, error=str(e)[:200])


if __name__ == "__main__":
    main()
