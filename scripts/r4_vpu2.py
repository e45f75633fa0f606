"""Round-4 exact-tier attack (VERDICT round-2 #3): the symmetric-weight
``vpu2`` kernel — F = m_i*m_j*inv shared by both sides, F*d computed once
and reduced along rows AND columns (23 VPU flops/pair vs vpu's 26), with
the 1/m post-scale outside the kernel.  New speed-of-light:
3.9e12 / 11.5 = ~339 GInter/s (vs 300 for vpu's 13 flops/interaction).

Stages:
1. Compiled accuracy spot-check at N=8192 (single + multi-panel) vs the
   f64 oracle — catches the platform operand-ingestion bug interpret
   mode can't (docs/PERF.md).
2. Force-only tile sweep at N=65536 / N=1M: vpu baseline vs vpu2 at the
   candidate geometries.
3. Bench-harness confirmation at 1M (jitted run_steps, 10 steps x 3
   trials, median) for the winners + fresh compile+warmup timing of the
   compile-once fused path (VERDICT #2 done-criterion: < ~90 s).

Continue-on-error per config (relay sessions drop mid-sweep).
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
    with open("/tmp/r4_vpu2.log", "a") as f:
        f.write(msg + "\n")


def rec(**kw):
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    log(f"backend: {jax.default_backend()}")
    stages = set((sys.argv[1] if len(sys.argv) > 1 else "acc,tiles,bench")
                 .split(","))

    rng = np.random.default_rng(5)
    if "acc" in stages:
        n0 = 8192
        pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
        mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
        ref0 = oracle_forces(pos0, mass0, 0.002)
        for label, kw in (
                ("single-panel", dict(block_i=512, block_u=1024)),
                ("multi-panel", dict(block_i=512, block_u=512, panel_nb=5)),
        ):
            try:
                acc = np.asarray(fps.forces_pallas_sym(
                    jnp.asarray(pos0), jnp.asarray(mass0), 0.002,
                    variant="vpu2", interpret=False, **kw))
                bad = relative_mismatch(acc, ref0, 0.01, 1e-4).mean()
                err = np.abs(acc - ref0) / (np.abs(ref0) + 1e-30)
                p99 = float(np.percentile(err, 99))
                log(f"[acc] vpu2 {label} compiled badfrac={bad:.3g} "
                    f"p99={p99:.3g}")
                rec(stage="r4_acc", variant="vpu2", label=label,
                    badfrac=float(bad), p99=p99)
                if bad > 1e-6:
                    log("[acc] FAIL — aborting")
                    return 1
            except Exception:
                log(f"[acc] vpu2 {label} FAILED:\n{traceback.format_exc()}")
                return 1

    if "tiles" in stages:
        configs = [
            ("vpu", 512, 1536),    # round-3 production point (baseline)
            ("vpu2", 512, 1536),
            ("vpu2", 512, 2048),
            ("vpu2", 512, 1024),
            ("vpu2", 256, 2048),
        ]
        for n in (65536, 1 << 20):
            pos = jnp.asarray(
                rng.uniform(-1e5, 1e5, (n, 3)).astype(np.float32))
            mass = jnp.asarray(
                rng.uniform(1e5, 1e9, (n,)).astype(np.float32))
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
                        f"G/s-equiv ({best / 10 * 1000:.2f} ms/eval)")
                    rec(stage="r4_tiles", n=n, variant=variant, block_i=bi,
                        block_u=bu, ginter_per_s=round(gs, 1),
                        ms_per_eval=round(best / 10 * 1000, 2))
                except Exception as e:
                    log(f"[tiles] n={n} {variant} ({bi},{bu}) FAILED: "
                        f"{type(e).__name__}: {str(e)[:300]}")

    if "turbof" in stages:
        # Symmetric-weight turbo: accuracy spot-check then tiles.
        n0 = 8192
        pos0 = rng.uniform(-1e5, 1e5, (n0, 3)).astype(np.float32)
        mass0 = rng.uniform(1e5, 1e9, (n0,)).astype(np.float32)
        ref0 = oracle_forces(pos0, mass0, 0.002)
        try:
            acc = np.asarray(fps.forces_pallas_sym(
                jnp.asarray(pos0), jnp.asarray(mass0), 0.002,
                block_i=512, block_u=1024, variant="turbof",
                interpret=False))
            err = np.abs(acc - ref0) / (np.abs(ref0) + 1e-30)
            p99 = float(np.percentile(err, 99))
            log(f"[acc] turbof compiled p99={p99:.3g}")
            rec(stage="r4_acc", variant="turbof", p99=p99)
            if p99 > 5e-2:
                log("[acc] turbof out of tier — skipping tiles")
                raise RuntimeError("acc")
            for n in (65536, 1 << 20):
                pos = jnp.asarray(
                    rng.uniform(-1e5, 1e5, (n, 3)).astype(np.float32))
                mass = jnp.asarray(
                    rng.uniform(1e5, 1e9, (n,)).astype(np.float32))
                for variant, bi, bu in (("turbo", 512, 2048),
                                        ("turbof", 512, 2048),
                                        ("turbof", 512, 1536)):
                    try:
                        def chain(p, _v=variant, _bi=bi, _bu=bu):
                            def body(p, _):
                                a = fps.forces_pallas_sym(
                                    p, mass, 0.002, block_i=_bi,
                                    block_u=_bu, variant=_v,
                                    interpret=False)
                                return p + 1e-30 * a, None
                            p, _ = jax.lax.scan(body, p, None, length=10)
                            return p
                        fn = jax.jit(chain)
                        np.asarray(fn(pos))
                        best = float("inf")
                        for _ in range(3):
                            t0 = time.perf_counter()
                            np.asarray(fn(pos))
                            best = min(best, time.perf_counter() - t0)
                        gs = n * n * 10 / best / 1e9
                        log(f"[turbof] n={n} {variant} ({bi},{bu}): "
                            f"{gs:.1f} G/s-equiv")
                        rec(stage="r4_turbof", n=n, variant=variant,
                            block_i=bi, block_u=bu,
                            ginter_per_s=round(gs, 1))
                    except Exception as e:
                        log(f"[turbof] n={n} {variant} ({bi},{bu}) FAILED:"
                            f" {type(e).__name__}: {str(e)[:200]}")
        except Exception:
            log(f"[turbof] stage FAILED:\n{traceback.format_exc()}")

    if "bench" in stages:
        from nbody_tpu.bench_lib import run_benchmark
        for impl in ("pallas_sym2", "pallas_sym"):
            try:
                t0 = time.perf_counter()
                r = run_benchmark(n=1 << 20, steps=10, impl=impl, trials=3)
                log(f"[bench] {impl} 1M: {r['value']} G/s "
                    f"(spread {r['spread_pct']}%, compile+warmup "
                    f"{r['compile_plus_warmup_s']} s, total "
                    f"{time.perf_counter() - t0:.0f} s)")
                rec(stage="r4_bench", **{k: r[k] for k in (
                    "impl", "n_bodies", "value", "ginter_min", "ginter_max",
                    "spread_pct", "ms_per_step", "compile_plus_warmup_s",
                    "finite")})
            except Exception:
                log(f"[bench] {impl} FAILED:\n{traceback.format_exc()}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
