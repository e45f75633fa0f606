"""Round-5: challenge the 65k quantization settlement with a
HETEROGENEOUS superblock layout (VERDICT r4 weak #6).

The settlement (BASELINE.md "N=65,536 exact is quantization-walled")
proved no UNIFORM U escapes the +3.9% structural overhead at N=2^16:
every U that is a multiple of block_i divides 2^16 into an even
superblock count (pays the antipodal extra) or pads.  A heterogeneous
cover sidesteps the number theory: split 65,536 into two panels, each
with an ODD superblock count and zero ghosts, and stitch them with the
N3L rect sweep:

    P1 = 41 x 1536 = 62,976   (odd self sweep at the optimal U)
    P2 = 5 x 512   =  2,560   (odd self sweep at U=512)
    total work = self(P1) + self(P2) + rect(P1, P2)   [every pair once]

Work accounting (vs 2^31 useful pairs): self(P1) 41x21 superblock
phases = 2.032e9, rect 1.612e8, self(P2) 3.9e6 -> +2.4% total, vs
uniform-1536's +3.9% — the padding term (1.55%) vanishes, the unhalved
diagonals (~1/(2*phases)) remain.  Predicted ceiling if the raw tile
rate held: 291.6 * 1.039/1.024 ≈ 295.9 — still < 300 (the remaining gap
is the small-grid DMA ramp the settlement already prices), so the
EXPECTED outcome is an extension of the settlement, not a beat; this
script measures which.

Composition runs as ONE jitted function (3 pallas_calls); oracle
badfrac gate first (exact tier — must be 0), then the duration-targeted
measurement vs the uniform incumbent.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/bench_results_r5.jsonl"
N1, N2 = 62976, 2560    # 41 x 1536  +  5 x 512


def rec(**kw):
    row = {"script": "r11_hetero65k", **kw}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    from nbody_tpu.ops import forces_pallas_sym as fps
    from nbody_tpu.oracle.numpy_oracle import relative_mismatch
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    n = N1 + N2
    assert n == 65536
    rng = np.random.default_rng(13)
    pos = rng.uniform(-1e5, 1e5, (n, 3)).astype(np.float32)
    mass = rng.uniform(1e5, 1e9, (n,)).astype(np.float32)

    def hetero(p, m):
        p1, p2 = p[:N1], p[N1:]
        m1, m2 = m[:N1], m[N1:]
        a1 = fps.forces_pallas_sym(p1, m1, 0.002, block_i=512,
                                   block_u=1536, variant="vpu2",
                                   interpret=False)
        a2 = fps.forces_pallas_sym(p2, m2, 0.002, block_i=512,
                                   block_u=512, variant="vpu2",
                                   interpret=False)
        r1, r2 = fps.rect_forces_sym(p1, m1, p2, m2, 0.002, block_i=512,
                                     block_u=512, variant="vpu2",
                                     interpret=False)
        return jnp.concatenate([a1 + r1, a2 + r2], axis=0)

    # ---- correctness gate on the FULL layout: f64 oracle rows for a
    # 2k-row sample spanning both panels (full-N sources; a full 65k
    # oracle is ~10 min of single-core numpy for no extra information),
    # plus badfrac-0 agreement with the (already oracle-proven) uniform
    # compiled kernel over ALL rows.
    acc = np.asarray(jax.jit(hetero)(jnp.asarray(pos), jnp.asarray(mass)))
    rows = np.r_[0:1024, N1:N1 + 1024]
    p64, m64 = pos.astype(np.float64), mass.astype(np.float64)
    r = p64[None, :, :] - p64[rows][:, None, :]
    d2 = np.sum(r * r, axis=-1) + 0.002
    f = m64[None, :] / np.sqrt(d2 * d2 * d2)
    f[np.arange(rows.size), rows] = 0.0
    ref_rows = np.einsum("cn,cnd->cd", f, r)
    bad = float(relative_mismatch(acc[rows], ref_rows, 0.01, 1e-4).mean())
    uni = np.asarray(jax.jit(lambda p: fps.forces_pallas_sym(
        p, jnp.asarray(mass), 0.002, block_i=512, block_u=1536,
        variant="vpu2", interpret=False))(jnp.asarray(pos)))
    bad_u = float(relative_mismatch(acc, uni, 0.01, 1e-4).mean())
    rec(stage="gate", n=n, badfrac_oracle_rows=bad,
        badfrac_vs_uniform=bad_u, ok=bad == 0.0 and bad_u == 0.0)
    if bad != 0.0 or bad_u != 0.0:
        print("gate FAILED")
        return 1

    # ---- measurement: hetero vs uniform incumbent, same protocol.
    evals = 34   # ~0.5 s/eval target is ~15 ms -> ~0.5 s device work
    posj, massj = jnp.asarray(pos), jnp.asarray(mass)

    def chain_hetero(p):
        def body(p, _):
            return p + 1e-30 * hetero(p, massj), None
        p, _ = jax.lax.scan(body, p, None, length=evals)
        return p

    def chain_uniform(p):
        def body(p, _):
            a = fps.forces_pallas_sym(p, massj, 0.002, block_i=512,
                                      block_u=1536, variant="vpu2",
                                      interpret=False)
            return p + 1e-30 * a, None
        p, _ = jax.lax.scan(body, p, None, length=evals)
        return p

    for label, fn in (("uniform_1536", jax.jit(chain_uniform)),
                      ("hetero_41x1536_5x512", jax.jit(chain_hetero))):
        np.asarray(fn(posj))            # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(posj))
            best = min(best, time.perf_counter() - t0)
        gs = float(n) * n * evals / best / 1e9
        rec(stage="measure", layout=label, n=n,
            ginter_per_s=round(gs, 1),
            ms_per_eval=round(best / evals * 1e3, 3))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
