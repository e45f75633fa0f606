"""Round-5 compiled spot-check: the mesh-bounded dispatcher on the REAL chip.

``parallel/multiprog._ShardedBoundedForces``'s ``jit(shard_map(...))``
programs had (before this script) run only on CPU interpret meshes and
the driver dryrun — no real-Mosaic compile (VERDICT r4 weak #3).  The
relay exposes exactly one chip, so the check runs the dispatcher on a
1-device real mesh — the same playbook as the round-2 ring and round-8
RDMA P=1 gates:

1. ``gate``: a binding ``prog_cap`` through the product
   ``Simulation(cfg, mesh=...)`` surface, 10 steps (the measured clean
   chaos horizon), gated badfrac == 0 vs the f64 oracle, for the exact
   tiers.  This is the check CLAUDE.md's convention requires (interpret
   mode does not catch the operand-ingestion platform bug or the Mosaic
   lowering rules; docs/PERF.md).
2. ``overhead``: the per-program dispatch cost of the mesh dispatcher,
   measured by splitting the SAME N=65536 eval into 1 (fused sharded) /
   k bounded programs per step and regressing wall time on program
   count.  Appends JSONL rows (bench_results_r5.jsonl) and feeds the
   docs/PERF.md round-5 section.

Usage: python scripts/r9_mesh_chip.py [gate|overhead|all]   (default all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.models.state import SimState
from nbody_tpu.oracle.numpy_oracle import oracle_run, relative_mismatch
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.multiprog import _ShardedBoundedForces

JSONL = "bench_results_r5.jsonl"
STEPS_GATE = 10


def emit(row):
    row = {"script": "r9_mesh_chip", **row}
    print(json.dumps(row), flush=True)
    with open(JSONL, "a") as f:
        f.write(json.dumps(row) + "\n")


def make_state(n, seed=7):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1e5, 1e5, size=(n, 3)).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    mass = rng.uniform(1e5, 1e9, size=n).astype(np.float32)
    return SimState(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                    acc=jnp.zeros((n, 3), jnp.float32),
                    mass=jnp.asarray(mass)), pos, vel, mass


def gate(mesh):
    """Oracle gate: badfrac must be EXACTLY 0 at the 10-step clean
    horizon for the exact tiers through Simulation + binding cap."""
    n = 2048
    state, pos, vel, mass = make_state(n)
    rpos, rvel, racc = oracle_run(pos, vel, mass, 0.002, 0.1, STEPS_GATE)
    failures = 0
    for impl in ("pallas_sym2", "pallas_sym"):
        # panel_nb=4 makes the cap actually SPLIT the eval (panels are
        # the split granularity): self program + cross-panel pair
        # batches + scatter/final — the machinery that had never met
        # real Mosaic (a panel_nb=1 plan is one program and exercises
        # only the dispatcher routing).
        cap = 5e5
        cfg = SimConfig(n_bodies=n, impl=impl, block_i=128, block_j=512,
                        block_u=128, panel_nb=4, prog_cap=cap,
                        resident=False)
        plan = _ShardedBoundedForces(cfg, mesh, impl, cap)
        assert plan.panels_self > 1, "panel decomposition did not engage"
        assert plan.total_programs >= 3, "cap did not split the eval"
        sim = Simulation(cfg, state=state, mesh=mesh, comm="ring")
        assert sim._use_multiprog, "cap did not engage the dispatcher"
        res = sim.run(n_steps=STEPS_GATE, log_every=0)
        opos = np.asarray(res.state.pos)
        frac = float(relative_mismatch(opos, rpos, 0.01, 1.0).mean())
        ok = bool(np.all(np.isfinite(opos))) and frac == 0.0
        failures += not ok
        emit({"phase": "gate", "impl": impl, "n": n,
              "programs_per_eval": plan.total_programs,
              "badfrac": frac, "ok": ok})
    return failures


def overhead(mesh):
    """Regress per-step wall time on programs/step at fixed N.

    Equal-work protocol (CLAUDE.md round-6 rule): every config runs the
    SAME physics (N=65536, sym2 exact) for enough steps that device work
    dominates noise; the slope of t_step vs programs/step is the
    dispatch cost the mesh dispatcher adds per bounded program."""
    n = 65536
    steps = 20
    state, _, _, _ = make_state(n, seed=11)
    rows = []
    # panel_nb=2 everywhere (cap rows AND the fused baseline) so every
    # config runs the same panel geometry; only the split varies.
    for cap in (None, 1.5e9, 4e8, 1.2e8):
        cfg = SimConfig(n_bodies=n, impl="pallas_sym2", prog_cap=cap,
                        panel_nb=2, resident=False)
        progs = 1
        if cap is not None:
            progs = _ShardedBoundedForces(
                cfg, mesh, "pallas_sym2", cap).total_programs
        sim = Simulation(cfg, state=state, mesh=mesh, comm="ring")
        assert sim._use_multiprog == (cap is not None)
        # Warmup runs the FULL step count: the fused path's chunk program
        # embeds n_steps (lru key), so a shorter warmup would leave the
        # measured run to compile+first-touch-load inside the timed
        # region (~14 s through the relay — the first cut of this script
        # read 722 ms/step for the fused row that way).
        t0 = time.perf_counter()
        res = sim.run(n_steps=steps, log_every=0)
        np.asarray(res.state.pos)
        warm_s = time.perf_counter() - t0
        trials = []
        for _ in range(3):
            sim2 = Simulation(cfg, state=state, mesh=mesh, comm="ring")
            t0 = time.perf_counter()
            res = sim2.run(n_steps=steps, log_every=0)
            np.asarray(res.state.pos)
            trials.append(time.perf_counter() - t0)
        ms_step = float(np.median(trials)) / steps * 1e3
        row = {"phase": "overhead", "n": n, "cap": cap,
               "programs_per_step": progs, "steps": steps,
               "ms_per_step": round(ms_step, 3),
               "trials_s": [round(t, 3) for t in trials],
               "warmup_s": round(warm_s, 1),
               "ginter_s": round(n * n / (ms_step * 1e-3) / 1e9, 1)}
        rows.append(row)
        emit(row)
    # Least-squares slope: ms/step vs programs/step.
    x = np.array([r["programs_per_step"] for r in rows], float)
    y = np.array([r["ms_per_step"] for r in rows], float)
    slope, icept = np.polyfit(x, y, 1)
    emit({"phase": "overhead_fit", "ms_per_program": round(float(slope), 2),
          "ms_intercept": round(float(icept), 2)})
    return 0


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    mesh = make_mesh(1)
    failures = 0
    if what in ("gate", "all"):
        failures += gate(mesh)
    if what in ("overhead", "all"):
        failures += overhead(mesh)
    raise SystemExit(failures)


if __name__ == "__main__":
    main()
