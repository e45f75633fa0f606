#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line.

Headline config: N=1M single chip, exact pair-symmetric Pallas kernel
(BASELINE.md config #3; impl=auto resolves to pallas_sym2 on TPU
— the symmetric-weight exact tier, docs/PERF.md round 4).
vs_baseline is the ratio to the 300 GInter/s/chip north-star from
BASELINE.json.  The headline is the MEDIAN of >=3 independent trials of
>=10 steps each, with min/max spread in the JSON (the relayed chip
carries load jitter; the judged number should be statistically boring).
A second measurement of the loose-contract turbo tier rides along under
the "turbo" key (same trial protocol), and a third at the REFERENCE'S
OWN design point (N=8192, constants.h:13 — served by the VMEM-resident
multi-step mode, ops/resident.py) under "ref_design_point".
"""

import json
import os
import sys


def main() -> int:
    n = int(os.environ.get("NBODY_BENCH_N", "1048576"))
    steps = int(os.environ.get("NBODY_BENCH_STEPS", "10"))
    trials = int(os.environ.get("NBODY_BENCH_TRIALS", "3"))
    impl = os.environ.get("NBODY_BENCH_IMPL", "auto")
    with_turbo = os.environ.get("NBODY_BENCH_TURBO", "1") != "0"
    with_ref = os.environ.get("NBODY_BENCH_REFPOINT", "1") != "0"

    import jax
    if jax.default_backend() != "tpu":
        # CPU fallback (CI smoke): small problem, XLA path.
        n = min(n, 4096)
        impl = "xla"
        with_turbo = False
        with_ref = False

    from nbody_tpu.bench_lib import run_benchmark

    def bench_once(tier_impl, tier_n=None, tier_steps="headline"):
        # The relay occasionally drops a session mid-run
        # (FailedPrecondition); one retry keeps the judged artifact
        # from vanishing on a transient (CLAUDE.md environment notes).
        # Deterministic misuse (bad impl/config -> ValueError/TypeError)
        # is NOT retried — rerunning a doomed multi-minute benchmark
        # just delays the failure.
        kw = dict(n=n if tier_n is None else tier_n,
                  steps=steps if tier_steps == "headline" else tier_steps,
                  impl=tier_impl, trials=trials)
        try:
            return run_benchmark(**kw)
        except (ValueError, TypeError):
            raise
        except Exception as e:
            print(f"bench: {tier_impl} attempt 1 failed "
                  f"({type(e).__name__}: {e}); retrying", file=sys.stderr)
            return run_benchmark(**kw)

    result = bench_once(impl)
    if with_turbo:
        try:
            t = bench_once("pallas_sym_turbo")
        except Exception as e:
            # The headline (exact tier) already succeeded: report it
            # rather than dying on the rider measurement.
            result["turbo_error"] = f"{type(e).__name__}: {e}"
        else:
            # Outside the except: a schema mismatch here should fail
            # loudly, not masquerade as a relay error.
            result["turbo"] = {k: t[k] for k in (
                "value", "vs_baseline", "ms_per_step", "ginter_min",
                "ginter_max", "spread_pct", "compile_plus_warmup_s",
                "compile_s", "first_touch_s")}
    if with_ref:
        # The reference's own config (N=8192): exact tier through the
        # resident routing, auto-sized trials (~1.5 s device work).
        # Same one-retry-on-transient protection as the other tiers.
        try:
            r = bench_once("auto", tier_n=8192, tier_steps=None)
        except Exception as e:
            result["ref_design_point_error"] = f"{type(e).__name__}: {e}"
        else:
            result["ref_design_point"] = {k: r[k] for k in (
                "value", "n_bodies", "steps", "ms_per_step", "impl",
                "resident", "ginter_min", "ginter_max", "spread_pct")}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
