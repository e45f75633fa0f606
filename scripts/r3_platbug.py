"""Platform-bug retest (ROADMAP): do pallas kernels still mis-ingest
XLA-computed auxiliary operand streams on the current stack?

Round-1 bisect (docs/PERF.md "A platform bug worth knowing about"):
feeding kernels premade packed operands (bf16 hi/lo packs) or SMEM tables
that were COMPUTED ON DEVICE produced ~60% wrong components, while the
identical kernels fed host-materialized copies of the same values were
exact.  Workaround since: kernels consume only plain pos/posT/mass
streams and derive packs in-kernel.

Minimal probe here: a blocked-VMEM reduction kernel summing a bf16
``[x_hi | x_lo | 1 | 0]`` pack across grid steps, fed
  (a) the pack computed by XLA on device,
  (b) the bit-identical pack round-tripped through the host,
  (c) plain pos, pack derived in-kernel (the production workaround).
All three must agree with the f64 host sum.  (a) != (b/c) reproduces the
bug; all-equal means the stack is fixed and premade packs are usable.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_platbug.log", "a") as f:
        f.write(msg + "\n")


def main():
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend: {jax.default_backend()}")
    N, U = 16384, 2048
    nb = N // U
    rng = np.random.default_rng(3)
    pos_host = rng.uniform(-1e5, 1e5, (N, 3)).astype(np.float32)

    def pack8_np(x):
        hi = x.astype(np.float32).astype(jnp.bfloat16)
        lo = (x - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        ones = np.ones((x.shape[0], 1), jnp.bfloat16)
        zeros = np.zeros((x.shape[0], 1), jnp.bfloat16)
        return np.concatenate([np.asarray(hi), np.asarray(lo), ones, zeros],
                              axis=1)

    def pack8_jnp(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate(
            [hi, lo, jnp.ones((x.shape[0], 1), jnp.bfloat16),
             jnp.zeros((x.shape[0], 1), jnp.bfloat16)], axis=1)

    # (a) device-computed pack: force a real XLA computation producing it.
    pos_dev = jnp.asarray(pos_host)
    pack_dev = jax.jit(pack8_jnp)(pos_dev * jnp.float32(1.0))
    # (b) the same values, materialized on host and pushed back.
    pack_host = jnp.asarray(np.asarray(pack_dev))
    np.testing.assert_array_equal(np.asarray(pack_dev),
                                  np.asarray(pack_host))

    def red_kernel(pack_ref, out_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += jnp.sum(pack_ref[:].astype(jnp.float32), axis=0,
                              keepdims=True)

    red = pl.pallas_call(
        red_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((U, 8), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=False,
    )

    def derive_kernel(pos_ref, out_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        x = pos_ref[:]
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pack = jnp.concatenate(
            [hi, lo, jnp.ones((U, 1), jnp.bfloat16),
             jnp.zeros((U, 1), jnp.bfloat16)], axis=1)
        out_ref[:] += jnp.sum(pack.astype(jnp.float32), axis=0,
                              keepdims=True)

    derive = pl.pallas_call(
        derive_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((U, 3), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=False,
    )

    ref = np.asarray(pack8_np(pos_host), np.float64).sum(axis=0)[None, :]
    res = {}
    res["premade_dev"] = np.asarray(red(pack_dev))
    res["premade_host"] = np.asarray(red(pack_host))
    res["derived"] = np.asarray(derive(pos_dev))
    ok = {}
    for k, v in res.items():
        rel = np.abs(v.astype(np.float64) - ref) / (np.abs(ref) + 1e-30)
        ok[k] = float(rel.max())
        log(f"[{k}] max rel err vs f64 host sum: {rel.max():.3g}")
    dev_vs_host = np.abs(res["premade_dev"] - res["premade_host"]).max()
    log(f"[premade dev vs host] max abs diff: {dev_vs_host:.3g}")
    # bf16 pack sums: expect ~1e-3-level agreement with f64 (bf16 rounding),
    # and BIT-equality between dev-fed and host-fed premade streams.
    if dev_vs_host == 0.0 and abs(ok["premade_dev"] - ok["derived"]) < 1e-6:
        log("VERDICT: premade-operand ingestion CLEAN on this probe "
            "(bug not reproduced)")
    else:
        log("VERDICT: premade-operand corruption REPRODUCED "
            "(workaround stays)")
    import json
    with open("/root/repo/bench_results_r3.jsonl", "a") as f:
        f.write(json.dumps({"stage": "r3_platbug",
                            "max_rel": {k: v for k, v in ok.items()},
                            "dev_vs_host_absdiff": float(dev_vs_host)})
                + "\n")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
