#!/usr/bin/env python
"""Block-size autotuner for the Pallas force kernels.

The reference fixes THREADS_PER_BLOCK / TILE_WIDTH_FACTOR at compile time
(constants.h:11-12) and checks them against device limits at launch
(kernel.cu:632-641).  This tool measures the real thing: sweeps
(block_i, block_j) for a given N/variant on the current backend and prints a
ranked table (one JSON line per config + a winner line).

Usage: python scripts/tune_blocks.py --n 65536 --impl pallas --steps 5 \
           [--grid 256x1024,512x2048,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

DEFAULT_GRID = [
    (128, 1024), (256, 512), (256, 1024), (256, 2048),
    (512, 1024), (512, 2048), (512, 4096), (1024, 2048),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "pallas_mxu", "pallas_fast",
                             "pallas_turbo"])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--grid", default=None,
                    help="comma-separated BIxBJ list")
    args = ap.parse_args()

    import nbody_tpu as nt
    from nbody_tpu.models.ordering import morton_sort_state
    from nbody_tpu.utils.timing import sync

    grid = DEFAULT_GRID
    if args.grid:
        grid = [tuple(int(x) for x in g.split("x"))
                for g in args.grid.split(",")]

    results = []
    for bi, bj in grid:
        try:
            cfg = nt.SimConfig(n_bodies=args.n, impl=args.impl,
                               block_i=bi, block_j=bj)
            state = nt.init_state(cfg)
            if args.impl in ("pallas_fast", "pallas_turbo"):
                state, _ = morton_sort_state(state, -cfg.max_pos, cfg.max_pos)
            out = nt.run_steps(state, cfg, args.steps)
            sync(out.pos)
            t0 = time.perf_counter()
            out = nt.run_steps(out, cfg, args.steps)
            sync(out.pos)
            dt = (time.perf_counter() - t0) / args.steps
            rec = {"block_i": bi, "block_j": bj,
                   "ms_per_step": round(dt * 1e3, 3),
                   "ginter_per_s": round(args.n ** 2 / dt / 1e9, 1)}
        except Exception as e:
            rec = {"block_i": bi, "block_j": bj,
                   "error": f"{type(e).__name__}: {str(e)[:90]}"}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ok = [r for r in results if "ginter_per_s" in r]
    if ok:
        best = max(ok, key=lambda r: r["ginter_per_s"])
        print(f"BEST: --block-i {best['block_i']} --block-j "
              f"{best['block_j']}  ({best['ginter_per_s']} GInter/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
