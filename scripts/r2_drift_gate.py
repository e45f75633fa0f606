"""Config-#2 drift-gate settlement at REFERENCE physics (VERDICT task 3).

Question: can an fp32 TPU implementation hold |E_dev - E_oracle|/|E_oracle|
<= 1e-3 over 1,000 steps at the reference's eps2=0.002 (effectively
unsoftened at |x|~1e5), and if not, why not?

Protocol:
  ladder8k   — N=8192: {reference, kdk} x dt {0.1, 0.01, 0.001}: device
               fp32 (pallas_sym) vs the native f64 CPU oracle.  Reports
               BOTH the device-vs-oracle drift and each side's own energy
               conservation |E(T) - E(0)|/|E(0)| — separating "integrator
               hurts both equally but trajectories diverge" from "device
               drifts".
  control8k  — N=8192, dt=0.1 reference: (a) device FLOAT64 (XLA) vs the
               f64 oracle — if this is tiny, the fp32 gap is precision,
               not framework; (b) pallas_kahan (compensated accumulation)
               vs plain pallas — bounds the fp32 summation-order term.
  confirm65k — N=65536 (the config-#2 N): fp32 pallas_sym vs the DEVICE
               f64 XLA run as oracle (the 1-core CPU oracle would need
               hours at this N; the 8k stage anchors f64-device == f64-CPU).

Results are appended to bench_results_r2.jsonl and summarized in
BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def rec(out, **kw):
    with open(out, "a") as f:
        f.write(json.dumps(kw) + "\n")
    log("[row] " + json.dumps(kw))


def device_run(n, dt, steps, integrator, impl, dtype="float32", seed=0,
               prog_chunk=100, eps2=0.002):
    """Chunked into <=prog_chunk-step programs: the relay kills single
    programs past ~60 s of kernel time (f64 XLA at 1k steps trips it)."""
    import jax.numpy as jnp
    from nbody_tpu import SimConfig, init_state, run_steps
    from nbody_tpu.models.energy import energy_f64
    from nbody_tpu.ops.step import prime_kdk
    cfg = SimConfig(n_bodies=n, dt=dt, eps2=eps2, impl=impl, seed=seed,
                    integrator=integrator, dtype=dtype, block_i=256,
                    block_u=1024, chunk=2048)
    state0 = init_state(cfg)
    if integrator == "kdk":
        state0 = prime_kdk(state0, cfg)
    e0 = energy_f64(state0, cfg.eps2)
    t0 = time.perf_counter()
    out = state0
    done = 0
    while done < steps:
        k = min(prog_chunk, steps - done)
        out = run_steps(out, cfg, k)
        np.asarray(out.pos)          # force completion per program
        done += k
    e1 = energy_f64(out, cfg.eps2)
    wall = time.perf_counter() - t0
    return state0, out, e0, e1, wall


def oracle_energy(pos0, vel0, mass, dt, steps, integrator, eps2=0.002):
    from nbody_tpu.models.energy import energy_f64
    from nbody_tpu.models.state import SimState
    from nbody_tpu.oracle import native
    if native.available():
        opos, ovel, _ = native.native_run(pos0, vel0, mass, eps2, dt,
                                          steps, dtype=np.float64,
                                          integrator=integrator)
    else:
        from nbody_tpu.oracle.numpy_oracle import oracle_run
        opos, ovel, _ = oracle_run(pos0, vel0, mass, eps2, dt, steps,
                                   dtype=np.float64, integrator=integrator)
    st = SimState(pos=opos, vel=ovel, acc=np.zeros_like(opos), mass=mass)
    e0s = SimState(pos=pos0, vel=vel0, acc=np.zeros_like(opos), mass=mass)
    return energy_f64(e0s, eps2), energy_f64(st, eps2)


def drift(a, b):
    return abs(a - b) / (abs(b) or 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="ladder8k,control8k,confirm65k")
    ap.add_argument("--out", default="bench_results_r2.jsonl")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--integrators", default="reference,kdk")
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    integrators = args.integrators.split(",")
    steps = args.steps

    import jax
    log(f"backend: {jax.default_backend()}")

    if "ladder8k" in stages:
        for integ in integrators:
            for dt in (0.1, 0.01, 0.001):
                s0, dev, e0, e1, wall = device_run(
                    8192, dt, steps, integ, "pallas_sym")
                t0 = time.perf_counter()
                oe0, oe1 = oracle_energy(
                    np.asarray(s0.pos), np.asarray(s0.vel),
                    np.asarray(s0.mass), dt, steps, integ)
                rec(args.out, stage="ladder8k", n=8192, dt=dt,
                    integrator=integ, steps=steps,
                    drift_dev_vs_oracle=drift(e1, oe1),
                    conserve_dev=drift(e1, e0),
                    conserve_oracle=drift(oe1, oe0),
                    dev_s=round(wall, 2),
                    oracle_s=round(time.perf_counter() - t0, 1))

    if "control8k" in stages:
        # (a) float64 device vs float64 oracle — framework-precision control.
        jax.config.update("jax_enable_x64", True)
        try:
            s0, dev, e0, e1, wall = device_run(
                8192, 0.1, steps, "reference", "xla", dtype="float64")
            oe0, oe1 = oracle_energy(
                np.asarray(s0.pos), np.asarray(s0.vel), np.asarray(s0.mass),
                0.1, steps, "reference")
            rec(args.out, stage="control8k_f64", n=8192, dt=0.1,
                integrator="reference", steps=steps,
                drift_dev_vs_oracle=drift(e1, oe1),
                conserve_dev=drift(e1, e0), conserve_oracle=drift(oe1, oe0),
                dev_s=round(wall, 2))
        finally:
            jax.config.update("jax_enable_x64", False)
        # (b) Kahan-compensated fp32 vs plain fp32 (summation-order bound).
        for impl in ("pallas", "pallas_kahan"):
            s0, dev, e0, e1, wall = device_run(
                8192, 0.1, steps, "reference", impl)
            oe0, oe1 = oracle_energy(
                np.asarray(s0.pos), np.asarray(s0.vel), np.asarray(s0.mass),
                0.1, steps, "reference")
            rec(args.out, stage="control8k_kahan", impl=impl, n=8192,
                dt=0.1, steps=steps,
                drift_dev_vs_oracle=drift(e1, oe1),
                conserve_dev=drift(e1, e0))

    if "wellposed" in stages:
        # The framework-exoneration control: at a well-posed softening
        # (eps ~ spacing/3, where the 1e-3 gate is physically meaningful),
        # f64 device vs f64 oracle isolates framework error from physics;
        # fp32 pallas_sym then shows the fp32 penalty in the same regime.
        eps2 = 1e7
        jax.config.update("jax_enable_x64", True)
        try:
            s0, dev, e0, e1, wall = device_run(
                8192, 0.1, steps, "reference", "xla", dtype="float64",
                eps2=eps2)
            oe0, oe1 = oracle_energy(
                np.asarray(s0.pos), np.asarray(s0.vel), np.asarray(s0.mass),
                0.1, steps, "reference", eps2=eps2)
            rec(args.out, stage="wellposed_f64", n=8192, dt=0.1, eps2=eps2,
                steps=steps, drift_dev_vs_oracle=drift(e1, oe1),
                conserve_dev=drift(e1, e0), conserve_oracle=drift(oe1, oe0))
        finally:
            jax.config.update("jax_enable_x64", False)
        s0, dev, e0, e1, wall = device_run(
            8192, 0.1, steps, "reference", "pallas_sym", eps2=eps2)
        oe0, oe1 = oracle_energy(
            np.asarray(s0.pos), np.asarray(s0.vel), np.asarray(s0.mass),
            0.1, steps, "reference", eps2=eps2)
        rec(args.out, stage="wellposed_f32_sym", n=8192, dt=0.1, eps2=eps2,
            steps=steps, drift_dev_vs_oracle=drift(e1, oe1),
            conserve_dev=drift(e1, e0), conserve_oracle=drift(oe1, oe0))

    if "confirm65k" in stages:
        jax.config.update("jax_enable_x64", True)
        try:
            for integ, dt in (("kdk", 0.001), ("kdk", 0.01)):
                s32, d32, e0_32, e1_32, w32 = device_run(
                    65536, dt, steps, integ, "pallas_sym")
                s64, d64, e0_64, e1_64, w64 = device_run(
                    65536, dt, steps, integ, "xla", dtype="float64",
                    prog_chunk=10)
                rec(args.out, stage="confirm65k", n=65536, dt=dt,
                    integrator=integ, steps=steps,
                    drift_f32_vs_f64dev=drift(e1_32, e1_64),
                    conserve_f32=drift(e1_32, e0_32),
                    conserve_f64=drift(e1_64, e0_64),
                    f32_s=round(w32, 1), f64_s=round(w64, 1))
        finally:
            jax.config.update("jax_enable_x64", False)

    log("DONE")


if __name__ == "__main__":
    sys.exit(main())
