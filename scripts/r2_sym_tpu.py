"""Round-2 real-TPU validation + perf sweep of the pair-symmetric kernels.

Stages (each prints incrementally; failures don't stop later stages):
  probe  — tiny compile probe: do the Mosaic constructs (resident scatter
           buffer, dynamic superblock indexing, mod index maps) compile and
           produce ORACLE-CORRECT results on the real chip?  (Interpret mode
           does NOT catch the platform operand-ingestion bug; docs/PERF.md.)
  acc    — accuracy tiers at N=8192 vs the f64 oracle.
  perf65 — N=65536 run_steps throughput across block configs.
  perf1m — N=1M throughput for the best config vs the one-sided baseline.

Run on the default (TPU) backend, one process at a time.
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def check_forces(n, block_i, block_u, panel_nb, variant, eps2=0.002, seed=0):
    import jax.numpy as jnp
    from nbody_tpu.ops.forces_pallas_sym import forces_pallas_sym
    from nbody_tpu.oracle.numpy_oracle import oracle_forces, relative_mismatch
    r = np.random.default_rng(seed)
    pos = r.uniform(-1e5, 1e5, (n, 3)).astype(np.float32)
    mass = r.uniform(1e5, 1e9, (n,)).astype(np.float32)
    t0 = time.perf_counter()
    acc = np.asarray(forces_pallas_sym(
        jnp.asarray(pos), jnp.asarray(mass), eps2, block_i=block_i,
        block_u=block_u, panel_nb=panel_nb, variant=variant,
        interpret=False))
    dt = time.perf_counter() - t0
    ref = oracle_forces(pos, mass, eps2)
    bad = float(relative_mismatch(acc, ref, 0.01, 1e-4).mean())
    err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
    p99 = float(np.percentile(err, 99))
    log(f"[acc] n={n} bi={block_i} bu={block_u} pnb={panel_nb} "
        f"{variant}: badfrac={bad:.3e} p99={p99:.3e} "
        f"(compile+run {dt:.1f}s)")
    return bad, p99


def bench(n, impl, block_i, block_u, steps, warmup=2, trials=2,
          panel_nb=None):
    from nbody_tpu.bench_lib import run_benchmark
    res = run_benchmark(n=n, steps=steps, impl=impl, block_i=block_i,
                        block_j=block_u, block_u=block_u,
                        warmup_steps=warmup, trials=trials,
                        panel_nb=panel_nb)
    log(f"[perf] n={n} impl={impl} bi={block_i} bu={block_u} pnb={panel_nb}: "
        f"{res['value']:.1f} GInter/s ({res['ms_per_step']:.2f} ms/step, "
        f"compile {res['compile_plus_warmup_s']:.0f}s, "
        f"finite={res['finite']})")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="probe,acc,perf65,perf1m")
    ap.add_argument("--out", default="/tmp/r2_sym_results.jsonl")
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    results = []

    def record(kind, **kw):
        kw["kind"] = kind
        results.append(kw)
        with open(args.out, "a") as f:
            f.write(json.dumps(kw) + "\n")

    import jax
    log(f"backend: {jax.default_backend()}")

    if "probe" in stages:
        for variant in ("vpu", "turbo"):
            try:
                bad, p99 = check_forces(4096, 64, 256, None, variant)
                record("probe", variant=variant, bad=bad, p99=p99)
            except Exception:
                log(f"[probe] {variant} FAILED:\n{traceback.format_exc()}")
                record("probe", variant=variant, error=True)

    if "acc" in stages:
        for variant in ("vpu", "turbo"):
            for pnb in (None, 5):   # single panel and 2-panel decomposition
                try:
                    bad, p99 = check_forces(8192, 256, 1024, pnb, variant)
                    record("acc", variant=variant, panel_nb=pnb, bad=bad,
                           p99=p99)
                except Exception:
                    log(f"[acc] {variant} pnb={pnb} FAILED:\n"
                        f"{traceback.format_exc()}")
                    record("acc", variant=variant, panel_nb=pnb, error=True)

    if "perf65" in stages:
        for impl, bi, bu, pnb in [
                ("pallas_sym", 512, 1024, None),
                ("pallas_sym", 256, 2048, None),
                ("pallas_sym_turbo", 512, 1024, None),
                ("pallas_sym_turbo", 256, 2048, None)]:
            try:
                res = bench(65536, impl, bi, bu, steps=20, panel_nb=pnb)
                record("perf65", bench_impl=impl, bi=bi, bu=bu, pnb=pnb,
                       **{k: v for k, v in res.items() if k != "impl"})
            except Exception:
                log(f"[perf65] {impl} {bi}x{bu} FAILED:\n"
                    f"{traceback.format_exc()}")
                record("perf65", bench_impl=impl, bi=bi, bu=bu, error=True)

    if "perf1m" in stages:
        n = 1 << 20
        for impl, bi, bu, pnb in [
                ("pallas_sym", 512, 1024, 127),
                ("pallas_sym", 256, 1024, 255),
                ("pallas_sym", 512, 512, 255),
                ("pallas_sym_turbo", 512, 1024, 127),
                ("pallas_sym_turbo", 256, 1024, 255),
                ("pallas_sym_turbo", 512, 512, 255)]:
            try:
                res = bench(n, impl, bi, bu, steps=3, warmup=1, trials=2,
                            panel_nb=pnb)
                record("perf1m", bench_impl=impl, bi=bi, bu=bu, pnb=pnb,
                       **{k: v for k, v in res.items() if k != "impl"})
            except Exception:
                log(f"[perf1m] {impl} {bi}x{bu} pnb={pnb} FAILED:\n"
                    f"{traceback.format_exc()}")
                record("perf1m", bench_impl=impl, bi=bi, bu=bu, pnb=pnb,
                       error=True)

    log("DONE " + json.dumps({"n_results": len(results)}))


if __name__ == "__main__":
    sys.exit(main())
