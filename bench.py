#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line.

Headline config: single-chip Pallas tiled force kernel at the largest N that
fits comfortably (BASELINE.md config ladder).  vs_baseline is the ratio to
the 300 GInter/s/chip north-star from BASELINE.json.
"""

import json
import os
import sys


def main() -> int:
    # Headline config: N=1M single chip, exact pair-symmetric Pallas kernel
    # (BASELINE.md config #3; impl=auto resolves to pallas_sym on TPU).
    # ~4.4 s/step on v5e; steps kept small to bound runtime.
    n = int(os.environ.get("NBODY_BENCH_N", "1048576"))
    steps = int(os.environ.get("NBODY_BENCH_STEPS", "3"))
    impl = os.environ.get("NBODY_BENCH_IMPL", "auto")

    import jax
    if jax.default_backend() != "tpu":
        # CPU fallback (CI smoke): small problem, XLA path.
        n = min(n, 4096)
        impl = "xla"

    from nbody_tpu.bench_lib import run_benchmark
    result = run_benchmark(n=n, steps=steps, impl=impl)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
