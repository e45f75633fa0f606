"""Newton's-third-law symmetric Pallas force kernels — each unordered pair
is computed ONCE and contributes to both bodies' accelerations.

Neither the reference's tiled kernel (``kernel.cu:99-114``) nor its
reduction family exploits pair antisymmetry: both sweep the full NxN
interaction matrix, computing every pair twice.  This module is the
TPU-first halving of that work (round-2 headline, VERDICT.md task 1):

- Bodies are grouped into *superblocks* of ``U``; the superblock count
  ``nb`` is padded to an ODD number so the circular-offset sweep
  ``j = (i + d) mod nb`` for ``d = 1 .. (nb-1)/2`` visits every unordered
  off-diagonal superblock pair exactly once — no duplicate-pair guards, no
  idle grid steps (an even nb would double-count the antipodal offset).
- For each (i-block, j-superblock) tile the shared per-pair factor
  ``inv = rsqrt((|r|^2 + eps2)^3)`` is computed once; the i-side
  accumulates ``+ m_j * inv * r`` (force on i from j) and the j-side
  ``- m_i * inv * r`` (force on j from i; masses differ, the *geometry* is
  shared).  ~26 VPU flops per pair delivering TWO interactions, vs ~19
  flops per single interaction in the one-sided kernel.
- The i-side accumulator is a standard blocked output (revisited
  consecutively across the ``d`` sweep).  The j-side ("scatter") output is
  the hard part on TPU — its visits are non-consecutive — so it lives
  VMEM-RESIDENT for the whole kernel as a ``(nb, 3, U)`` buffer (constant
  index map) accumulated at dynamic superblock offsets.  The transposed
  (3, U) orientation keeps the physical footprint at 32 B/body (the
  sublane dim pads 3->8) instead of the catastrophic 512 B/body a lane-dim
  of 3 would cost, and matches the natural (1, U) shape of cross-sublane
  reductions — no in-kernel transposes anywhere.
- VMEM caps the resident buffer, so large N decomposes into *panels* at
  the JAX level: a triangular kernel per panel, a rectangular two-output
  kernel per unordered panel pair, and a tiny one-sided kernel for the
  diagonal superblocks (keeping self-pair handling out of the hot kernel;
  self-pairs vanish via r=0 under softening exactly as in the reference,
  ``kernel.cu:17-27``).

Variants mirror the one-sided ladder (forces_pallas.py): ``vpu`` (exact
tier — same force law, fp32 throughout, summation order differs only in
grouping) and ``turbo`` (both accumulations on the MXU as single bf16
matmuls; same documented loose contract as one-sided turbo).

All operand streams are plain ``pos (N,3)`` / ``posT (3,N)`` /
``mass (1,N)/(N,1)`` slices — everything derived is computed in-kernel
(required by the platform operand-ingestion bug documented in
docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.state import round_up

# Per-core VMEM is ~16 MB; the resident scatter buffer plus the fused
# elementwise working set must stay below it (the analog of the
# reference's sharedMemPerBlock check, kernel.cu:637-641).
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024

SYM_VARIANTS = ("vpu", "vpu2", "turbo", "turbof", "turbo2", "mxu",
                "turbop")

# Variants whose kernels emit MASS-SCALED raw sums (the symmetric pair
# weight F = m_i*m_j*inv is shared by both sides of each pair, so the
# per-pair tensor F*d is computed ONCE and row- AND col-reduced — 23 VPU
# flops/pair vs vpu's 26; callers divide by the receiving body's mass
# OUTSIDE the kernel, one cheap XLA elementwise per output).  ``turbof``
# is the MXU twin: ONE bf16 weight matrix feeds both accumulation
# matmuls (turbo builds two).
_MASS_SCALED_VARIANTS = ("vpu2", "turbof")

# ``turbop`` — turbo with the j-side accumulate chain DEFERRED one grid
# step (round-5 headroom experiment, BASELINE.md turbo-SOL settlement):
# the r10 peeling ablations priced turbo's j-side pass (fj bf16 cast +
# xi8 pack + sublane-contracted matmul) at 17% of tile time, NOT hidden
# under the VPU stream the way the lane-contracted i-matmul is.  turbop
# stashes the tile's bf16(fj) / xi8 / xjT in VMEM scratch and issues the
# matmul + dynamic-offset scatter at the TOP of the NEXT grid step, where
# the chain has no dependency on that step's in-flight VPU pair terms —
# if Mosaic can overlap an independent sublane-contraction chain with the
# VPU wavefront, the j-pass rides free (ceiling ~473 G/s at 1M); if the
# chain's cost is irreducible VPU issue slots (the cast and the implicit
# operand relayout both run on vector hardware), turbop measures ~turbo.
# Results are BIT-IDENTICAL to turbo (same math, same per-slot add order;
# tested).  Scratch cost: (BI,U) bf16 + (BI,8) bf16 + (3,U) f32.

# Bench-only ablation kernels (vpu_noj / vpu_fix0 / vpu_rc measurement
# variants) live OUT of the production dispatch: ``ops/ablation_sym.py``
# registers factories here via ``enable()``.  The hot-path factories below
# handle only SYM_VARIANTS and delegate anything else to these registries.
ABLATION_SYM_KERNELS: "dict[str, object]" = {}
ABLATION_RECT_KERNELS: "dict[str, object]" = {}

# Grid-schedule ladder for the VPU exact tiers (identical force math and
# per-tile sums; only the grid order / scatter cadence differs, so results
# differ from "classic" by reassociation ulps only — same accuracy class,
# oracle-gated):
#
# - "classic": grid (I, si, dd) — the j-superblock changes every grid
#   step, so the resident scatter buffer takes a dynamic-offset RMW per
#   (BI x U) tile and the (3,U)/(1,U) j-streams re-DMA per step.
# - "fold": grid (I, dd, si) — the i-SUPERBLOCK (U,3) stays VMEM-resident
#   per I (same total HBM bytes, fewer DMAs), the j-streams change only
#   per (I, dd), and the j-side tile contributions accumulate in a (3,U)
#   VMEM scratch across the si sub-sweep, hitting the scatter buffer with
#   ONE dynamic-offset RMW per superblock visit — sub x fewer RMWs (3x at
#   the production 512x1536 geometry).
#
# ``schedule=None`` resolves per variant here; flip after measurement.
SYM_SCHEDULES = ("classic", "fold")
_FOLD_VARIANTS = ("vpu", "vpu2")
DEFAULT_SCHEDULE = {v: "classic" for v in SYM_VARIANTS}


def resolve_schedule(schedule: "str | None", variant: str) -> str:
    if schedule is None:
        return DEFAULT_SCHEDULE.get(variant, "classic")
    if schedule not in SYM_SCHEDULES:
        raise ValueError(
            f"schedule must be one of {SYM_SCHEDULES} or None, "
            f"got {schedule!r}")
    if schedule == "fold" and variant not in _FOLD_VARIANTS:
        raise ValueError(
            f"schedule='fold' applies to the VPU exact tiers "
            f"{_FOLD_VARIANTS}, not {variant!r}")
    return schedule

# Default interactions-per-program bound for the chunked dispatcher
# (forces_pallas_sym_chunked): ~45 s at the exact tier's measured
# ~266 GInter/s — safely under execution-time-limited runtimes (the axon
# relay kills single programs at ~60 s).
DEFAULT_PROG_CAP = 1.2e13


def _pair_terms(xi, xjT, mass_row_j, mass_col_i, eps2):
    """Shared per-tile geometry: returns (dx, dy, dz, fi, fj) where
    fi = m_j * inv (weights the force ON i) and fj = m_i * inv (weights
    the force ON j).  Force law contract: d2 = |r|^2 + eps2;
    inv = rsqrt(d2^3) (kernel.cu:9-29, no G, no i!=j guard)."""
    dx = xjT[0:1, :] - xi[:, 0:1]          # (BI, U)
    dy = xjT[1:2, :] - xi[:, 1:2]
    dz = xjT[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    inv = jax.lax.rsqrt(d2 * d2 * d2)      # (BI, U)
    fi = mass_row_j * inv                  # (BI, U): m_j weights acc_i
    fj = mass_col_i * inv                  # (BI, U): m_i weights acc_j
    return dx, dy, dz, fi, fj


def _pair_products_sym(xi, xjT, mass_row_j, mass_col_i, eps2):
    """vpu2 exact tile: the symmetric pair weight ``F = m_i m_j inv`` is
    shared by BOTH sides, so the weighted difference tensor ``F*d`` is
    computed once per component and reduced along rows (i-side) AND
    columns (j-side) — 23 VPU flops per pair delivering two interactions
    (11.5/interaction) vs vpu's 26 (13): 3 sub, 6 d2+eps2, 2 cube,
    1 rsqrt, 2 weight, 3 product, 6 reduce-adds.  Raw sums carry the
    receiving body's mass as a factor; callers scale by 1/m_i (1/m_j for
    the scatter side) outside the kernel (``_inv_mass_scale``) — zero-mass
    ghosts map to weight 0 there, so ghosts stay inert.

    Same force-law contract as every tier (d2 = |r|^2 + eps2,
    inv = rsqrt(d2^3), kernel.cu:9-29); the reassociation
    (m_i m_j inv) d / m_i vs (m_j inv) d costs ~1-2 extra ulp per term —
    same exact accuracy class (oracle-gated).
    Returns (acc_i_raw (BI,3), acc_j_raw (3,U) positive magnitude)."""
    dx = xjT[0:1, :] - xi[:, 0:1]
    dy = xjT[1:2, :] - xi[:, 1:2]
    dz = xjT[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    f = (mass_col_i * mass_row_j) * jax.lax.rsqrt(d2 * d2 * d2)
    ai, aj = [], []
    for d in (dx, dy, dz):
        p = f * d
        ai.append(jnp.sum(p, axis=1, keepdims=True))
        aj.append(jnp.sum(p, axis=0, keepdims=True))
    return jnp.concatenate(ai, axis=1), jnp.concatenate(aj, axis=0)


def _inv_mass_scale(raw, mass, variant):
    """Undo the mass-scaled raw sums of ``_MASS_SCALED_VARIANTS``:
    raw (m, 3) * (1/mass) per body; ghosts (mass 0) map to 0 (their raw
    sums are exactly 0 anyway — every term carries their own mass)."""
    if variant not in _MASS_SCALED_VARIANTS:
        return raw
    w = jnp.where(mass > 0, 1.0 / mass, 0.0)
    return raw * w[:, None]


def _accum_i_vpu(dx, dy, dz, fi):
    """(BI,3) i-side tile contribution: rows sum over the j (lane) axis."""
    ax = jnp.sum(fi * dx, axis=1, keepdims=True)
    ay = jnp.sum(fi * dy, axis=1, keepdims=True)
    az = jnp.sum(fi * dz, axis=1, keepdims=True)
    return jnp.concatenate([ax, ay, az], axis=1)


def _accum_j_vpu(dx, dy, dz, fj):
    """(3,U) j-side tile contribution (positive magnitude; caller negates):
    columns sum over the i (sublane) axis."""
    sx = jnp.sum(fj * dx, axis=0, keepdims=True)
    sy = jnp.sum(fj * dy, axis=0, keepdims=True)
    sz = jnp.sum(fj * dz, axis=0, keepdims=True)
    return jnp.concatenate([sx, sy, sz], axis=0)


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _pack8(x, n_rows):
    """[x_hi | x_lo | 1 | 0] bf16 packing for the accumulate matmul
    (positions at domain scale need hi/lo splits; see docs/PERF.md)."""
    hi, lo = _bf16_split(x)
    return jnp.concatenate(
        [hi, lo, jnp.ones((n_rows, 1), jnp.bfloat16),
         jnp.zeros((n_rows, 1), jnp.bfloat16)], axis=1)


def _accum_i_turbo(fi, xi, pos_j, block_u):
    """i-side accumulate on the MXU: bf16(fi) @ [xj_hi|xj_lo|1|0]."""
    xj8 = _pack8(pos_j, block_u)                           # (U, 8) bf16
    out = jax.lax.dot_general(
        fi.astype(jnp.bfloat16), xj8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BI, 8)
    return (out[:, 0:3] + out[:, 3:6]) - xi * out[:, 6:7]


def _accum_j_turbo(fj, xi, xjT, block_i):
    """j-side accumulate on the MXU, produced directly in (3,U) orientation:
    contract the i (sublane) axis of both operands — xi8^T @ fj — so the
    result needs no in-kernel transpose.  Returns the (3,U) contribution
    sum_i fj*(xi - xj) = sum_i fj*xi - xj*sum_i fj (add to acc_j)."""
    xi8 = _pack8(xi, block_i)                              # (BI, 8) bf16
    out8 = jax.lax.dot_general(
        xi8, fj.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (8, U)
    return (out8[0:3, :] + out8[3:6, :]) - xjT * out8[6:7, :]


def _accum_both_turbof(fb, xi, xjT, pos_j, block_i, block_u):
    """turbof: both accumulations on the MXU from the SAME bf16 symmetric
    weight matrix ``fb = bf16(m_i m_j inv)`` — one weight product and one
    cast per pair (turbo needs two of each).  Raw sums are mass-scaled;
    callers apply the 1/m post-scale (``_inv_mass_scale``).  Same loose
    accuracy contract as turbo (bf16 weight, ~0.4%/pair)."""
    xj8 = _pack8(pos_j, block_u)                           # (U, 8) bf16
    out = jax.lax.dot_general(
        fb, xj8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BI, 8)
    ai = (out[:, 0:3] + out[:, 3:6]) - xi * out[:, 6:7]
    xi8 = _pack8(xi, block_i)                              # (BI, 8) bf16
    out8 = jax.lax.dot_general(
        xi8, fb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (8, U)
    aj = (out8[0:3, :] + out8[3:6, :]) - xjT * out8[6:7, :]
    return ai, aj


def _mass_folded_pack(x, m_col, n_rows):
    """turbo2 pack: [P_hi | P_lo | m_hi | m_lo] bf16 with P = m*x, so the
    contraction against raw bf16(inv) yields BOTH sum(m*inv*x) and
    sum(m*inv) — the per-pair mass multiplies move from the VPU into the
    pack (O(n) per tile instead of O(BI*U) per pair).  Both P and m are
    hi/lo split, so pack fidelity is ~f32; the tier-limiting error remains
    bf16(inv) (~0.4%/pair), same contract as turbo."""
    p = m_col * x
    ph, pl = _bf16_split(p)
    mh, ml = _bf16_split(m_col)
    return jnp.concatenate([ph, pl, mh, ml], axis=1)       # (n, 8) bf16


def _accum_i_turbo2(inv_bf16, xi, pos_j, mass_col_j, block_u):
    """acc_i tile contribution = sum_j (m_j inv)(xj - xi), one bf16 matmul
    against the mass-folded j pack."""
    xj8m = _mass_folded_pack(pos_j, mass_col_j, block_u)   # (U, 8)
    out = jax.lax.dot_general(
        inv_bf16, xj8m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BI, 8)
    return (out[:, 0:3] + out[:, 3:6]) - xi * (out[:, 6:7] + out[:, 7:8])


def _accum_j_turbo2(inv_bf16, xi, mass_col_i, xjT, block_i):
    """acc_j tile contribution = sum_i (m_i inv)(xi - xj), in (3,U)
    orientation via the transposed contraction."""
    xi8m = _mass_folded_pack(xi, mass_col_i, block_i)      # (BI, 8)
    out8 = jax.lax.dot_general(
        xi8m, inv_bf16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (8, U)
    return (out8[0:3, :] + out8[3:6, :]) - xjT * (out8[6:7, :]
                                                  + out8[7:8, :])


def _accum_both_mxu(inv, xi, xjT, mass_col_i, pos_j, mass_col_j,
                    block_i, block_u):
    """Near-exact MXU tier: hi/lo bf16 limbs of ``inv`` (~16-bit fidelity)
    against the mass-folded packs, both sides — four matmuls per tile, ~15
    VPU flops per pair for TWO interactions.  Accuracy is bounded by the
    16-bit representation of inv (p99 ~3e-4 vs the f64 oracle, the same
    tier as the one-sided mxu variant) rather than turbo's 8-bit."""
    ih, il = _bf16_split(inv)
    xj8m = _mass_folded_pack(pos_j, mass_col_j, block_u)   # (U, 8)
    dn_i = (((1,), (0,)), ((), ()))
    out = (jax.lax.dot_general(ih, xj8m, dn_i,
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(il, xj8m, dn_i,
                                 preferred_element_type=jnp.float32))
    acc_i = (out[:, 0:3] + out[:, 3:6]) - xi * (out[:, 6:7] + out[:, 7:8])
    xi8m = _mass_folded_pack(xi, mass_col_i, block_i)      # (BI, 8)
    dn_j = (((0,), (0,)), ((), ()))
    out8 = (jax.lax.dot_general(xi8m, ih, dn_j,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xi8m, il, dn_j,
                                  preferred_element_type=jnp.float32))
    acc_j = (out8[0:3, :] + out8[3:6, :]) - xjT * (out8[6:7, :]
                                                   + out8[7:8, :])
    return acc_i, acc_j


# --------------------------------------------------------------------------
# Kernel bodies
# --------------------------------------------------------------------------

def _diag_kernel_vpu(pos_i_ref, posT_ref, mass_row_ref, acc_ref, *, eps2):
    """One-sided sweep of a diagonal superblock (i-block x own superblock).
    Each grid step is visited once: write, no accumulation.  Self-pairs
    vanish via r=0 under softening (kernel.cu:17-27), exactly like the
    one-sided production kernel — no masks."""
    xi = pos_i_ref[:]
    xjT = posT_ref[:]
    m = mass_row_ref[:]
    dx = xjT[0:1, :] - xi[:, 0:1]
    dy = xjT[1:2, :] - xi[:, 1:2]
    dz = xjT[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    fi = m * jax.lax.rsqrt(d2 * d2 * d2)
    acc_ref[:] = _accum_i_vpu(dx, dy, dz, fi)


def _scatter_add(acc_jT_ref, j_sb, contrib):
    """acc_jT[j_sb] += contrib (3,U), via explicit dynamic slicing (the
    scatter buffer is VMEM-resident; grid steps are sequential on TPU, so
    read-modify-write at a dynamic superblock offset is race-free)."""
    sl = (pl.ds(j_sb, 1), slice(None), slice(None))
    acc_jT_ref[sl] = acc_jT_ref[sl] + contrib[None]


@functools.lru_cache(maxsize=None)
def _make_sym_kernel(variant, eps2, nb, sub, block_i, block_u):
    """Triangular (within-panel) kernel body.  Grid (I, si, dd):
    I = i-superblock, si = i-sub-block within it, dd = circular offset - 1;
    j-superblock = (I + 1 + dd) mod nb.  (lru_cache so every panel's
    pallas_call traces the SAME kernel object -> one Mosaic compilation.)"""
    if variant in ABLATION_SYM_KERNELS:
        return ABLATION_SYM_KERNELS[variant](eps2, nb, sub, block_i, block_u)
    if variant not in ("vpu", "vpu2", "turbo", "turbof", "turbo2", "mxu",
                       "turbop"):
        raise ValueError(
            f"unknown sym variant {variant!r}: production variants are "
            f"{SYM_VARIANTS}; bench-only ablation variants register via "
            f"nbody_tpu.ops.ablation_sym.enable()")
    if variant == "turbop":
        return _make_sym_kernel_turbop(eps2, nb, sub, block_i, block_u)

    def body(pos_i_ref, mass_col_ref, posT_ref, mass_row_ref, pos_j_ref,
             mass_col_j_ref, acc_i_ref, acc_jT_ref):
        i_sb = pl.program_id(0)
        dd = pl.program_id(2)
        first = jnp.logical_and(
            jnp.logical_and(i_sb == 0, pl.program_id(1) == 0), dd == 0)

        @pl.when(first)
        def _():
            acc_jT_ref[...] = jnp.zeros_like(acc_jT_ref)

        @pl.when(dd == 0)
        def _():
            acc_i_ref[:] = jnp.zeros_like(acc_i_ref)

        xi = pos_i_ref[:]                   # (BI, 3)
        xjT = posT_ref[:]                   # (3, U)
        # int32 constant: lax.rem is strict about dtypes, and an x64-enabled
        # process would promote a bare Python int to int64.
        j_sb = jax.lax.rem(i_sb + 1 + dd, jnp.int32(nb))
        if variant in ("turbo2", "mxu", "turbof"):
            dx = xjT[0:1, :] - xi[:, 0:1]
            dy = xjT[1:2, :] - xi[:, 1:2]
            dz = xjT[2:3, :] - xi[:, 2:3]
            d2 = dx * dx + dy * dy + dz * dz + eps2
            inv = jax.lax.rsqrt(d2 * d2 * d2)
            if variant == "turbof":
                fb = ((mass_col_ref[:] * mass_row_ref[:])
                      * inv).astype(jnp.bfloat16)
                ai, aj = _accum_both_turbof(fb, xi, xjT, pos_j_ref[:],
                                            block_i, block_u)
                acc_i_ref[:] += ai
                _scatter_add(acc_jT_ref, j_sb, aj)
            elif variant == "turbo2":
                ib = inv.astype(jnp.bfloat16)
                acc_i_ref[:] += _accum_i_turbo2(
                    ib, xi, pos_j_ref[:], mass_col_j_ref[:], block_u)
                _scatter_add(acc_jT_ref, j_sb, _accum_j_turbo2(
                    ib, xi, mass_col_ref[:], xjT, block_i))
            else:
                ai, aj = _accum_both_mxu(
                    inv, xi, xjT, mass_col_ref[:], pos_j_ref[:],
                    mass_col_j_ref[:], block_i, block_u)
                acc_i_ref[:] += ai
                _scatter_add(acc_jT_ref, j_sb, aj)
            return
        if variant == "vpu2":
            ai, aj = _pair_products_sym(
                xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
            acc_i_ref[:] += ai
            _scatter_add(acc_jT_ref, j_sb, -aj)
            return
        dx, dy, dz, fi, fj = _pair_terms(
            xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
        if variant == "vpu":
            acc_i_ref[:] += _accum_i_vpu(dx, dy, dz, fi)
            _scatter_add(acc_jT_ref, j_sb, -_accum_j_vpu(dx, dy, dz, fj))
        else:  # turbo
            acc_i_ref[:] += _accum_i_turbo(fi, xi, pos_j_ref[:], block_u)
            _scatter_add(acc_jT_ref, j_sb, _accum_j_turbo(fj, xi, xjT,
                                                          block_i))

    if variant.startswith("vpu"):
        def kernel(pos_i_ref, mass_col_ref, posT_ref, mass_row_ref,
                   acc_i_ref, acc_jT_ref):
            body(pos_i_ref, mass_col_ref, posT_ref, mass_row_ref, None,
                 None, acc_i_ref, acc_jT_ref)
        return kernel
    if variant in ("turbo", "turbof"):
        def kernel(pos_i_ref, mass_col_ref, posT_ref, mass_row_ref,
                   pos_j_ref, acc_i_ref, acc_jT_ref):
            body(pos_i_ref, mass_col_ref, posT_ref, mass_row_ref, pos_j_ref,
                 None, acc_i_ref, acc_jT_ref)
        return kernel

    # turbo2 / mxu share the mass-folded-pack operand signature.
    def kernel(pos_i_ref, mass_col_ref, posT_ref, pos_j_ref, mass_col_j_ref,
               acc_i_ref, acc_jT_ref):
        body(pos_i_ref, mass_col_ref, posT_ref, None, pos_j_ref,
             mass_col_j_ref, acc_i_ref, acc_jT_ref)
    return kernel


@functools.lru_cache(maxsize=None)
def _make_sym_kernel_turbop(eps2, nb, sub, block_i, block_u):
    """Triangular turbop kernel (see the ``turbop`` ladder note): turbo
    math with the j-side accumulate chain deferred one grid step through
    VMEM scratch.  Grid (I, si, dd) like classic; the scratch carries the
    PREVIOUS tile's bf16(fj) / xi8 / xjT, and the deferred scatter slot is
    reconstructed from the previous step's program ids.  The last grid
    step flushes its predecessor AND runs its own j-pass synchronously.
    Bit-identical to turbo (same values, same per-slot add order)."""
    du = (nb - 1) // 2

    def kernel(pos_i_ref, mass_col_ref, posT_ref, mass_row_ref, pos_j_ref,
               acc_i_ref, acc_jT_ref, fjb_ref, xi8_ref, xjp_ref):
        i_sb = pl.program_id(0)
        si = pl.program_id(1)
        dd = pl.program_id(2)
        first = jnp.logical_and(
            jnp.logical_and(i_sb == 0, si == 0), dd == 0)
        last = jnp.logical_and(
            jnp.logical_and(i_sb == nb - 1, si == sub - 1), dd == du - 1)

        @pl.when(first)
        def _():
            acc_jT_ref[...] = jnp.zeros_like(acc_jT_ref)

        @pl.when(dd == 0)
        def _():
            acc_i_ref[:] = jnp.zeros_like(acc_i_ref)

        # Flush the previous tile's deferred j accumulate: an MXU chain
        # with no dependency on this step's VPU pair terms below.
        @pl.when(jnp.logical_not(first))
        def _():
            p_i = jnp.where(jnp.logical_or(dd > 0, si > 0), i_sb, i_sb - 1)
            p_dd = jnp.where(dd > 0, dd - 1, jnp.int32(du - 1))
            j_prev = jax.lax.rem(p_i + 1 + p_dd, jnp.int32(nb))
            out8 = jax.lax.dot_general(
                xi8_ref[:], fjb_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (8, U)
            aj = ((out8[0:3, :] + out8[3:6, :])
                  - xjp_ref[:] * out8[6:7, :])
            _scatter_add(acc_jT_ref, j_prev, aj)

        xi = pos_i_ref[:]                   # (BI, 3)
        xjT = posT_ref[:]                   # (3, U)
        j_sb = jax.lax.rem(i_sb + 1 + dd, jnp.int32(nb))
        dx, dy, dz, fi, fj = _pair_terms(
            xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
        del dx, dy, dz
        acc_i_ref[:] += _accum_i_turbo(fi, xi, pos_j_ref[:], block_u)

        @pl.when(jnp.logical_not(last))
        def _():
            fjb_ref[:] = fj.astype(jnp.bfloat16)
            xi8_ref[:] = _pack8(xi, block_i)
            xjp_ref[:] = xjT

        @pl.when(last)
        def _():
            _scatter_add(acc_jT_ref, j_sb,
                         _accum_j_turbo(fj, xi, xjT, block_i))

    return kernel


@functools.lru_cache(maxsize=None)
def _make_rect_kernel_turbop(eps2, block_i, block_u):
    """Rectangular turbop kernel: grid (ia, jb), j chain deferred one
    step (see ``_make_sym_kernel_turbop``).  acc_bT is resident for the
    whole kernel, so deferral across the ia boundary is safe."""

    def kernel(pos_a_ref, mass_col_ref, posT_b_ref, mass_row_ref,
               pos_b_ref, acc_a_ref, acc_bT_ref, fjb_ref, xi8_ref,
               xjp_ref):
        ia = pl.program_id(0)
        jb = pl.program_id(1)
        na = pl.num_programs(0)
        nbb = pl.num_programs(1)
        first = jnp.logical_and(ia == 0, jb == 0)
        last = jnp.logical_and(ia == na - 1, jb == nbb - 1)

        @pl.when(first)
        def _():
            acc_bT_ref[...] = jnp.zeros_like(acc_bT_ref)

        @pl.when(jb == 0)
        def _():
            acc_a_ref[:] = jnp.zeros_like(acc_a_ref)

        @pl.when(jnp.logical_not(first))
        def _():
            j_prev = jnp.where(jb > 0, jb - 1, nbb - 1)
            out8 = jax.lax.dot_general(
                xi8_ref[:], fjb_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (8, U)
            aj = ((out8[0:3, :] + out8[3:6, :])
                  - xjp_ref[:] * out8[6:7, :])
            _scatter_add(acc_bT_ref, j_prev, aj)

        xi = pos_a_ref[:]
        xjT = posT_b_ref[:]
        dx, dy, dz, fi, fj = _pair_terms(
            xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
        del dx, dy, dz
        acc_a_ref[:] += _accum_i_turbo(fi, xi, pos_b_ref[:], block_u)

        @pl.when(jnp.logical_not(last))
        def _():
            fjb_ref[:] = fj.astype(jnp.bfloat16)
            xi8_ref[:] = _pack8(xi, block_i)
            xjp_ref[:] = xjT

        @pl.when(last)
        def _():
            _scatter_add(acc_bT_ref, jb,
                         _accum_j_turbo(fj, xi, xjT, block_i))

    return kernel


_TURBOP_SCRATCH = (lambda block_i, block_u, dtype: [
    pltpu.VMEM((block_i, block_u), jnp.bfloat16),
    pltpu.VMEM((block_i, 8), jnp.bfloat16),
    pltpu.VMEM((3, block_u), dtype),
])


@functools.lru_cache(maxsize=None)
def _make_sym_kernel_fold(variant, eps2, nb, sub, block_i, block_u):
    """Triangular kernel, "fold" schedule: grid (I, dd, si) with si
    INNERMOST.  The i-superblock window (U,3) is resident per I and the
    kernel slices its si-th (BI,3) sub-block in VMEM; j-side tile
    contributions fold into a (3,U) scratch across the si sweep and the
    resident scatter buffer takes ONE dynamic-offset RMW per (I, dd) —
    sub x fewer than classic.  i-side accumulation order (ascending dd
    per i-element) matches classic exactly; the j-side sums are grouped
    (t0+t1+t2 added once) — reassociation ulps only."""

    def kernel(pos_I_ref, mass_col_ref, posT_ref, mass_row_ref,
               acc_i_ref, acc_jT_ref, jsc_ref):
        i_sb = pl.program_id(0)
        dd = pl.program_id(1)
        si = pl.program_id(2)
        first = jnp.logical_and(
            jnp.logical_and(i_sb == 0, dd == 0), si == 0)

        @pl.when(first)
        def _():
            acc_jT_ref[...] = jnp.zeros_like(acc_jT_ref)

        @pl.when(jnp.logical_and(dd == 0, si == 0))
        def _():
            acc_i_ref[...] = jnp.zeros_like(acc_i_ref)

        row = pl.ds(si * block_i, block_i)
        xi = pos_I_ref[row, :]              # (BI, 3) slice of resident (U, 3)
        xjT = posT_ref[:]                   # (3, U)
        j_sb = jax.lax.rem(i_sb + 1 + dd, jnp.int32(nb))
        if variant == "vpu2":
            ai, aj = _pair_products_sym(
                xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
        else:                               # vpu
            dx, dy, dz, fi, fj = _pair_terms(
                xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
            ai = _accum_i_vpu(dx, dy, dz, fi)
            aj = _accum_j_vpu(dx, dy, dz, fj)
        acc_i_ref[row, :] += ai

        @pl.when(si == 0)
        def _():
            jsc_ref[...] = aj

        @pl.when(si != 0)
        def _():
            jsc_ref[...] += aj

        @pl.when(si == sub - 1)
        def _():
            _scatter_add(acc_jT_ref, j_sb, -jsc_ref[...])

    return kernel


@functools.lru_cache(maxsize=None)
def _make_rect_kernel_fold(variant, eps2, sub, block_i, block_u):
    """Rectangular kernel, "fold" schedule: grid (IA, jb, si), si
    innermost — the a-side superblock is resident per IA, acc_bT takes
    one RMW per (IA, jb).  See ``_make_sym_kernel_fold``."""

    def kernel(pos_A_ref, mass_col_ref, posT_b_ref, mass_row_ref,
               acc_a_ref, acc_bT_ref, jsc_ref):
        ia_sb = pl.program_id(0)
        jb = pl.program_id(1)
        si = pl.program_id(2)
        first = jnp.logical_and(
            jnp.logical_and(ia_sb == 0, jb == 0), si == 0)

        @pl.when(first)
        def _():
            acc_bT_ref[...] = jnp.zeros_like(acc_bT_ref)

        @pl.when(jnp.logical_and(jb == 0, si == 0))
        def _():
            acc_a_ref[...] = jnp.zeros_like(acc_a_ref)

        row = pl.ds(si * block_i, block_i)
        xi = pos_A_ref[row, :]
        xjT = posT_b_ref[:]
        if variant == "vpu2":
            ai, aj = _pair_products_sym(
                xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
        else:                               # vpu
            dx, dy, dz, fi, fj = _pair_terms(
                xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
            ai = _accum_i_vpu(dx, dy, dz, fi)
            aj = _accum_j_vpu(dx, dy, dz, fj)
        acc_a_ref[row, :] += ai

        @pl.when(si == 0)
        def _():
            jsc_ref[...] = aj

        @pl.when(si != 0)
        def _():
            jsc_ref[...] += aj

        @pl.when(si == sub - 1)
        def _():
            _scatter_add(acc_bT_ref, jb, -jsc_ref[...])

    return kernel


@functools.lru_cache(maxsize=None)
def _make_rect_kernel(variant, eps2, block_i, block_u):
    """Cross-panel kernel body: all (i in panel A) x (j in panel B) tiles,
    each once, two-sided.  Grid (ia, jb): acc_a blocked (accumulates across
    jb), acc_bT resident."""
    if variant in ABLATION_RECT_KERNELS:
        return ABLATION_RECT_KERNELS[variant](eps2, block_i, block_u)
    if variant == "turbop":
        return _make_rect_kernel_turbop(eps2, block_i, block_u)
    if variant not in ("vpu", "vpu2", "turbo", "turbof", "turbo2", "mxu"):
        raise ValueError(
            f"unknown sym variant {variant!r}: production variants are "
            f"{SYM_VARIANTS}; bench-only ablation variants register via "
            f"nbody_tpu.ops.ablation_sym.enable()")

    def body(pos_a_ref, mass_col_ref, posT_b_ref, mass_row_ref, pos_b_ref,
             mass_col_b_ref, acc_a_ref, acc_bT_ref):
        ia = pl.program_id(0)
        jb = pl.program_id(1)

        @pl.when(jnp.logical_and(ia == 0, jb == 0))
        def _():
            acc_bT_ref[...] = jnp.zeros_like(acc_bT_ref)

        @pl.when(jb == 0)
        def _():
            acc_a_ref[:] = jnp.zeros_like(acc_a_ref)

        xi = pos_a_ref[:]
        xjT = posT_b_ref[:]
        if variant in ("turbo2", "mxu", "turbof"):
            dx = xjT[0:1, :] - xi[:, 0:1]
            dy = xjT[1:2, :] - xi[:, 1:2]
            dz = xjT[2:3, :] - xi[:, 2:3]
            d2 = dx * dx + dy * dy + dz * dz + eps2
            inv = jax.lax.rsqrt(d2 * d2 * d2)
            if variant == "turbof":
                fb = ((mass_col_ref[:] * mass_row_ref[:])
                      * inv).astype(jnp.bfloat16)
                ai, aj = _accum_both_turbof(fb, xi, xjT, pos_b_ref[:],
                                            block_i, block_u)
                acc_a_ref[:] += ai
                _scatter_add(acc_bT_ref, jb, aj)
            elif variant == "turbo2":
                ib = inv.astype(jnp.bfloat16)
                acc_a_ref[:] += _accum_i_turbo2(
                    ib, xi, pos_b_ref[:], mass_col_b_ref[:], block_u)
                _scatter_add(acc_bT_ref, jb, _accum_j_turbo2(
                    ib, xi, mass_col_ref[:], xjT, block_i))
            else:
                ai, aj = _accum_both_mxu(
                    inv, xi, xjT, mass_col_ref[:], pos_b_ref[:],
                    mass_col_b_ref[:], block_i, block_u)
                acc_a_ref[:] += ai
                _scatter_add(acc_bT_ref, jb, aj)
            return
        if variant == "vpu2":
            ai, aj = _pair_products_sym(
                xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
            acc_a_ref[:] += ai
            _scatter_add(acc_bT_ref, jb, -aj)
            return
        dx, dy, dz, fi, fj = _pair_terms(
            xi, xjT, mass_row_ref[:], mass_col_ref[:], eps2)
        if variant == "vpu":
            acc_a_ref[:] += _accum_i_vpu(dx, dy, dz, fi)
            _scatter_add(acc_bT_ref, jb, -_accum_j_vpu(dx, dy, dz, fj))
        else:  # turbo
            acc_a_ref[:] += _accum_i_turbo(fi, xi, pos_b_ref[:], block_u)
            _scatter_add(acc_bT_ref, jb, _accum_j_turbo(fj, xi, xjT,
                                                        block_i))

    if variant.startswith("vpu"):
        def kernel(pos_a_ref, mass_col_ref, posT_b_ref, mass_row_ref,
                   acc_a_ref, acc_bT_ref):
            body(pos_a_ref, mass_col_ref, posT_b_ref, mass_row_ref, None,
                 None, acc_a_ref, acc_bT_ref)
        return kernel
    if variant in ("turbo", "turbof"):
        def kernel(pos_a_ref, mass_col_ref, posT_b_ref, mass_row_ref,
                   pos_b_ref, acc_a_ref, acc_bT_ref):
            body(pos_a_ref, mass_col_ref, posT_b_ref, mass_row_ref,
                 pos_b_ref, None, acc_a_ref, acc_bT_ref)
        return kernel

    # turbo2 / mxu share the mass-folded-pack operand signature.
    def kernel(pos_a_ref, mass_col_ref, posT_b_ref, pos_b_ref,
               mass_col_b_ref, acc_a_ref, acc_bT_ref):
        body(pos_a_ref, mass_col_ref, posT_b_ref, None, pos_b_ref,
             mass_col_b_ref, acc_a_ref, acc_bT_ref)
    return kernel


# --------------------------------------------------------------------------
# pallas_call wrappers (one panel / one panel pair)
# --------------------------------------------------------------------------

def _diag_call(pos_p, posT_p, mass_row_p, *, eps2, nb, block_i, block_u,
               interpret):
    sub = block_u // block_i
    grid = (nb, sub)
    return pl.pallas_call(
        functools.partial(_diag_kernel_vpu, eps2=eps2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, 3), lambda I, si: (I * sub + si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_u), lambda I, si: (0, I),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u), lambda I, si: (0, I),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, 3), lambda I, si: (I * sub + si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * block_u, 3), pos_p.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=20 * nb * block_u * block_u,
            bytes_accessed=nb * block_u * 4 * 7,
            transcendentals=nb * block_u * block_u),
        interpret=interpret,
    )(pos_p, posT_p, mass_row_p)


def _sym_call(pos_p, mass_col_p, posT_p, mass_row_p, *, eps2, nb,
              block_i, block_u, variant, interpret, schedule="classic"):
    sub = block_u // block_i
    du = (nb - 1) // 2
    if schedule == "fold" and sub > 1:
        # Grid (I, dd, si): si innermost.  The i-superblock (U,3) window
        # and the (U,3) acc_i output are blocked by I alone (resident
        # across the whole (dd, si) sweep — same HBM bytes as classic in
        # sub x fewer DMAs); j streams change per (I, dd); the (3,U)
        # scratch folds the si sweep into one scatter RMW per (I, dd).
        kernel = _make_sym_kernel_fold(variant, eps2, nb, sub, block_i,
                                       block_u)
        m = nb * block_u
        return pl.pallas_call(
            kernel,
            grid=(nb, du, sub),
            in_specs=[
                pl.BlockSpec((block_u, 3), lambda I, dd, si: (I, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_i, 1),
                             lambda I, dd, si, _s=sub: (I * _s + si, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, block_u),
                             lambda I, dd, si, _nb=nb: (0, (I + 1 + dd) % _nb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_u),
                             lambda I, dd, si, _nb=nb: (0, (I + 1 + dd) % _nb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_u, 3), lambda I, dd, si: (I, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 3, block_u), lambda I, dd, si: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m, 3), pos_p.dtype),
                jax.ShapeDtypeStruct((nb, 3, block_u), pos_p.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((3, block_u), pos_p.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=26 * m * du * block_u,
                bytes_accessed=m * 4 * 16,
                transcendentals=m * du * block_u),
            interpret=interpret,
        )(pos_p, mass_col_p, posT_p, mass_row_p)
    grid = (nb, sub, du)
    kernel = _make_sym_kernel(variant, eps2, nb, sub, block_i, block_u)
    m = nb * block_u
    in_specs = [
        pl.BlockSpec((block_i, 3),
                     lambda I, si, dd: (I * sub + si, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_i, 1),
                     lambda I, si, dd: (I * sub + si, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, block_u),
                     lambda I, si, dd, _nb=nb: (0, (I + 1 + dd) % _nb),
                     memory_space=pltpu.VMEM),
    ]
    operands = [pos_p, mass_col_p, posT_p]
    if variant not in ("turbo2", "mxu"):
        in_specs.append(
            pl.BlockSpec((1, block_u),
                         lambda I, si, dd, _nb=nb: (0, (I + 1 + dd) % _nb),
                         memory_space=pltpu.VMEM))
        operands.append(mass_row_p)
    if variant in ("turbo", "turbof", "turbo2", "mxu", "turbop"):
        in_specs.append(
            pl.BlockSpec((block_u, 3),
                         lambda I, si, dd, _nb=nb: ((I + 1 + dd) % _nb, 0),
                         memory_space=pltpu.VMEM))
        operands.append(pos_p)
    if variant in ("turbo2", "mxu"):
        in_specs.append(
            pl.BlockSpec((block_u, 1),
                         lambda I, si, dd, _nb=nb: ((I + 1 + dd) % _nb, 0),
                         memory_space=pltpu.VMEM))
        operands.append(mass_col_p)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_i, 3),
                         lambda I, si, dd: (I * sub + si, 0),
                         memory_space=pltpu.VMEM),
            # Scatter buffer: resident in VMEM for the whole kernel.
            pl.BlockSpec((nb, 3, block_u), lambda I, si, dd: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 3), pos_p.dtype),
            jax.ShapeDtypeStruct((nb, 3, block_u), pos_p.dtype),
        ],
        scratch_shapes=(_TURBOP_SCRATCH(block_i, block_u, pos_p.dtype)
                        if variant == "turbop" else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=26 * m * du * block_u,
            bytes_accessed=m * 4 * 16,
            transcendentals=m * du * block_u),
        interpret=interpret,
    )(*operands)


def _rect_call(pos_a, mass_col_a, posT_b, mass_row_b, pos_b, mass_col_b, *,
               eps2, nb_b, block_i, block_u, variant, interpret,
               schedule="classic"):
    ma = pos_a.shape[0]
    sub = block_u // block_i
    if schedule == "fold" and sub > 1 and ma % block_u == 0:
        # Fold needs the a-side to tile into (U,3) superblocks; ragged
        # a-sides (rect_forces_sym pads to block_i only) fall through to
        # classic below — a geometry fallback, same results either way.
        kernel = _make_rect_kernel_fold(variant, eps2, sub, block_i,
                                        block_u)
        return pl.pallas_call(
            kernel,
            grid=(ma // block_u, nb_b, sub),
            in_specs=[
                pl.BlockSpec((block_u, 3), lambda IA, jb, si: (IA, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_i, 1),
                             lambda IA, jb, si, _s=sub: (IA * _s + si, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, block_u), lambda IA, jb, si: (0, jb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_u), lambda IA, jb, si: (0, jb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_u, 3), lambda IA, jb, si: (IA, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb_b, 3, block_u), lambda IA, jb, si: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ma, 3), pos_a.dtype),
                jax.ShapeDtypeStruct((nb_b, 3, block_u), pos_a.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((3, block_u), pos_a.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=26 * ma * nb_b * block_u,
                bytes_accessed=(ma + nb_b * block_u) * 4 * 8,
                transcendentals=ma * nb_b * block_u),
            interpret=interpret,
        )(pos_a, mass_col_a, posT_b, mass_row_b)
    grid = (ma // block_i, nb_b)
    kernel = _make_rect_kernel(variant, eps2, block_i, block_u)
    in_specs = [
        pl.BlockSpec((block_i, 3), lambda ia, jb: (ia, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_i, 1), lambda ia, jb: (ia, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, block_u), lambda ia, jb: (0, jb),
                     memory_space=pltpu.VMEM),
    ]
    operands = [pos_a, mass_col_a, posT_b]
    if variant not in ("turbo2", "mxu"):
        in_specs.append(
            pl.BlockSpec((1, block_u), lambda ia, jb: (0, jb),
                         memory_space=pltpu.VMEM))
        operands.append(mass_row_b)
    if variant in ("turbo", "turbof", "turbo2", "mxu", "turbop"):
        in_specs.append(
            pl.BlockSpec((block_u, 3), lambda ia, jb: (jb, 0),
                         memory_space=pltpu.VMEM))
        operands.append(pos_b)
    if variant in ("turbo2", "mxu"):
        in_specs.append(
            pl.BlockSpec((block_u, 1), lambda ia, jb: (jb, 0),
                         memory_space=pltpu.VMEM))
        operands.append(mass_col_b)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_i, 3), lambda ia, jb: (ia, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_b, 3, block_u), lambda ia, jb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ma, 3), pos_a.dtype),
            jax.ShapeDtypeStruct((nb_b, 3, block_u), pos_a.dtype),
        ],
        scratch_shapes=(_TURBOP_SCRATCH(block_i, block_u, pos_a.dtype)
                        if variant == "turbop" else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=26 * ma * nb_b * block_u,
            bytes_accessed=(ma + nb_b * block_u) * 4 * 8,
            transcendentals=ma * nb_b * block_u),
        interpret=interpret,
    )(*operands)


def _unscatter(acc_jT):
    """(nb, 3, U) resident-buffer layout -> (nb*U, 3)."""
    return acc_jT.transpose(0, 2, 1).reshape(-1, 3)


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------

def resolve_block_u(block_u: "int | None", n: int,
                    variant: str = "vpu") -> int:
    """None = auto: the measured optimum is N- AND variant-dependent
    (docs/PERF.md tile sweeps): exact (vpu) peaks at 512x1536 for large N
    (266 vs 247 G/s at 1M) but loses 14% above 1024 at 65k; the
    symmetric-weight vpu2 has a smaller per-pair live set and keeps 1536
    ahead down to 65k (273.0 vs 266.9 at 65k, 309.6 vs 297.6 at 262k —
    scripts/r5_smalln.py); turbo's live set is smaller still
    (accumulations leave the VPU for the MXU), so its optimum sits at
    2048 (414 vs 389 at 1M); mxu shares turbo's structure and takes
    2048 at large N (275.6 vs 267.0 at 1M, scripts/r5_mxu.py)."""
    if block_u is not None:
        return block_u
    if variant == "turbop":
        # turbop's deferral scratch ((BI,U) bf16 + packs) busts the VMEM
        # budget at U=2048 under DEFAULT panels (estimate ~16.1 MB > 14;
        # 2048 needs panel_nb<=25, scripts/r12_jpipe.py) — auto resolves
        # to the largest tile that fits the default panel budget.
        return 1536 if n >= 65536 else 1024
    if variant in ("turbo", "turbof", "turbo2"):
        # 2048 wins from 131k up (385.1 vs 377.2 at 131k, 398.7 vs 389.4
        # at 262k, 414.5 vs 389 at 1M); at 65k the duration-targeted
        # re-measure flips it to 1536 (367.0 vs 361.7 — the earlier
        # "350.8 vs 308" was the short-trial protocol); below 65k,
        # superblock rounding would pad >10% ghosts so 1024 holds.
        if n >= 131072:
            return 2048
        return 1536 if n >= 65536 else 1024
    if variant in ("vpu2",):
        # 1536 wins from 65k up; below that, superblock rounding would
        # pad ~8% ghosts (~16% pair work) so 1024 holds.
        return 1536 if n >= 65536 else 1024
    if variant == "mxu":
        # Both accumulations ride the MXU so the VPU live set is small
        # like turbo's: 2048 wins at 1M (275.6 vs 267.0 G/s,
        # scripts/r5_mxu.py) but not yet at 65k (220.3 vs 216.4);
        # crossover placed at the exact family's 512k threshold.
        if n >= (512 << 10):
            return 2048
        return 1536 if n >= 65536 else 1024
    return 1536 if n >= (512 << 10) else 1024


def default_panel_nb(block_u: int) -> int:
    """Default panel block budget: a panel's resident scatter buffer /
    streamed operands (32 B/body) fit a ~4 MiB VMEM slice.  The ONE
    definition every dispatcher shares (self sweeps, rect sweeps, flat
    mode, and the sharded bounded dispatcher `parallel/multiprog.py`) —
    the mesh path's bit-equality with the fused path depends on both
    sides splitting at identical panel boundaries, so this constant must
    not fork (review r4)."""
    return max(1, (4 * 1024 * 1024) // (32 * block_u))


def _rect_panel_layout(c: int, block_u: int, panel_nb: "int | None"):
    """Visiting-side decomposition of a rect sweep -> (nb_b, panels):
    ceil-split the needed blocks into equal panels of at most
    ``panel_nb`` blocks.  Shared by ``rect_forces_sym`` and the sharded
    bounded dispatcher (same boundary contract as ``default_panel_nb``)."""
    if panel_nb is None:
        panel_nb = default_panel_nb(block_u)
    nb_needed = -(-c // block_u)
    if nb_needed <= panel_nb:
        return nb_needed, 1
    panels = -(-nb_needed // panel_nb)
    return -(-nb_needed // panels), panels


def _panel_layout(n, block_u, max_nb):
    """Choose (nb_per_panel, n_panels): nb ODD (the circular sweep's
    no-duplicate condition), panels equal-sized and BALANCED, total >= n.

    Balancing matters: filling panels to the cap rounds the panel count up
    and pads the remainder with ghosts whose pair work is O(n_pad^2) — at
    N=1M a cap-filled layout wasted 24% of the bodies (1.55x the pair
    work).  Beyond even spreading, the ODD-nb constraint makes waste
    jagged in the panel count, so search the nearby counts: at
    N=1M/block_u=1536 the fewest-panels layout is 9x77 = 693 blocks for
    683 needed (+1.46% bodies = +2.9% pair work) while 12x57 = 684
    wastes 0.15% — measured 314.1 vs 307.0 GInter/s exact on v5e
    (docs/PERF.md "Panel-layout search").  A HYSTERESIS guards the other
    direction: extra panels mean more cross-panel pair programs (more
    dynamic-slice/scatter-home items at the same total pair work), so a
    higher panel count must cut total blocks by >0.25% (~0.5% pair
    work) over the incumbent — e.g. 4M/1536 keeps 33x83 (2739) rather
    than chasing 48x57 (2736, a 0.1% saving not worth 2.1x the pair
    items).  nb stays >= ~cap/2 so the per-panel sweep geometry
    (resident scatter buffer, slice count) keeps its measured
    efficiency class."""
    nb_needed = -(-n // block_u)
    if nb_needed <= max_nb:
        nb = nb_needed if nb_needed % 2 == 1 else nb_needed + 1
        return nb, 1
    cap = max_nb if max_nb % 2 == 1 else max_nb - 1
    best = None
    for panels in range(-(-nb_needed // cap),
                        -(-nb_needed // max(1, cap // 2)) + 1):
        nb = -(-nb_needed // panels)
        if nb % 2 == 0:
            nb += 1
        if nb > cap:
            continue
        total = panels * nb
        if best is None or total < best[0] * 0.9975:
            best = (total, nb, panels)
    return best[1], best[2]


def _validate_sym_blocks(block_i, block_u, nb, schedule="classic",
                         variant="vpu"):
    if block_i % 8 != 0:
        raise ValueError(f"block_i must be a multiple of 8, got {block_i}")
    if block_u % 128 != 0:
        raise ValueError(f"block_u must be a multiple of 128, got {block_u}")
    if block_u % block_i != 0:
        raise ValueError(
            f"block_u={block_u} must be a multiple of block_i={block_i}")
    # Working set: the fused elementwise chain's PEAK liveness schedules
    # to ~2 (BI,U) f32 temporaries (Mosaic interleaves the per-component
    # accumulations; calibrated against reality — (512,1536) and
    # (512,2048) both compile and run, scripts/r3_tiles.py) + the resident
    # scatter buffer at 32 B/body + streamed blocks (double-buffered).
    # (Estimate; Mosaic is the final arbiter and raises on real overflow.)
    live = 2 * block_i * block_u * 4
    resident = nb * 8 * block_u * 4
    # Streams, double-buffered, at physical (lane-padded) sizes: i-side
    # pos (BI,3)->(BI,128) and mass (BI,1)->(BI,128); j-side posT
    # (3,U)->(8,U) and mass_row (1,U)->(8,U).
    streams = 2 * (2 * block_i * 128 + 2 * 8 * block_u) * 4
    total = live + resident + streams
    if schedule == "fold":
        # The fold schedule keeps the (U,3) i-superblock window and the
        # (U,3) acc_i output resident per I (double-buffered across I
        # transitions, lane-padded 3->128) plus a (3,U) scratch.
        total += 2 * 2 * block_u * 128 * 4 + 8 * block_u * 4
    if variant == "turbop":
        # Deferred j-chain scratch: (BI,U) bf16 + (BI,8->128) bf16 +
        # (3->8,U) f32.
        total += block_i * block_u * 2 + block_i * 128 * 2 + 8 * block_u * 4
    if total > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"sym kernel working set ~{total / 1e6:.1f} MB exceeds VMEM "
            f"budget {_VMEM_BUDGET_BYTES / 1e6:.1f} MB "
            f"(block_i={block_i}, block_u={block_u}, panel_nb={nb}); "
            f"shrink blocks or panel size")


@functools.partial(
    jax.jit, static_argnames=("eps2", "block_i", "block_u", "panel_nb",
                              "variant", "interpret", "schedule"))
def _forces_sym_padded(pos_p, mass_p, eps2, block_i, block_u, panel_nb,
                       variant, interpret, schedule="classic"):
    n_pad = pos_p.shape[0]
    m = panel_nb * block_u
    panels = n_pad // m

    if panels > 1:
        # Compile-once multi-panel route: unrolling one pallas_call per
        # panel and per panel PAIR makes the XLA program grow as
        # panels + panels*(panels-1)/2 custom-call sites (~45 at N=1M) —
        # measured 420 s of compile+warmup (VERDICT round 2 #2).  Instead
        # scan the SAME two dynamic-offset programs the bounded-program
        # dispatcher uses (3 pallas_call sites total, any panel count);
        # accumulation order matches the unrolled loop per-slice, so the
        # result is bit-identical (tests/test_pallas_sym.py gates this).
        pos_flat = pos_p.reshape(-1)
        acc = jnp.zeros_like(pos_flat)
        acc = _sym_self_batch_prog(
            pos_flat, mass_p, acc, jnp.arange(panels, dtype=jnp.int32),
            eps2, block_i, block_u, panel_nb, variant, interpret, schedule)
        pairs = [(a, b) for a in range(panels) for b in range(a + 1, panels)]
        a_ids = jnp.asarray([p[0] for p in pairs], jnp.int32)
        b_ids = jnp.asarray([p[1] for p in pairs], jnp.int32)
        w = jnp.ones((len(pairs),), pos_flat.dtype)
        acc = _sym_pair_batch_prog(
            pos_flat, mass_p, acc, a_ids, b_ids, w, eps2,
            block_i, block_u, panel_nb, variant, interpret, schedule)
        return acc.reshape(n_pad, 3)

    posT = pos_p.T
    mass_row = mass_p[None, :]
    acc = _diag_call(pos_p, posT, mass_row, eps2=eps2, nb=panel_nb,
                     block_i=block_i, block_u=block_u, interpret=interpret)
    if panel_nb >= 3:
        acc_i, acc_jT = _sym_call(
            pos_p, mass_p[:, None], posT, mass_row, eps2=eps2, nb=panel_nb,
            block_i=block_i, block_u=block_u, variant=variant,
            interpret=interpret, schedule=schedule)
        acc = acc + _inv_mass_scale(acc_i + _unscatter(acc_jT), mass_p,
                                    variant)
    return acc


@functools.partial(
    jax.jit, static_argnames=("eps2", "block_i", "block_u", "nb_b",
                              "variant", "interpret", "schedule"))
def _rect_sym_padded(pos_a, mass_a, pos_b, mass_b, eps2, block_i, block_u,
                     nb_b, variant, interpret, schedule="classic"):
    mass_col_a = mass_a[:, None]
    posT_b = pos_b.T
    m = nb_b * block_u
    panels = pos_b.shape[0] // m
    acc_a = jnp.zeros_like(pos_a)
    acc_b = []
    for q in range(panels):
        sl = slice(q * m, (q + 1) * m)
        aa, abT = _rect_call(
            pos_a, mass_col_a, posT_b[:, sl], mass_b[sl][None, :],
            pos_b[sl], mass_b[sl][:, None], eps2=eps2, nb_b=nb_b,
            block_i=block_i, block_u=block_u, variant=variant,
            interpret=interpret, schedule=schedule)
        acc_a = acc_a + _inv_mass_scale(aa, mass_a, variant)
        acc_b.append(_inv_mass_scale(_unscatter(abT), mass_b[sl], variant))
    return acc_a, jnp.concatenate(acc_b, axis=0)


def rect_forces_sym(pos_a: jax.Array, mass_a: jax.Array,
                    pos_b: jax.Array, mass_b: jax.Array, eps2: float,
                    block_i: int = 512, block_u: "int | None" = None,
                    panel_nb: "int | None" = None,
                    variant: str = "vpu",
                    interpret: "bool | None" = None,
                    schedule: "str | None" = None):
    """Two-sided rectangular sweep between two DISJOINT body sets.

    Computes every (a, b) cross pair ONCE and returns ``(acc_a, acc_b)`` —
    the acceleration contributions on the a-bodies from the b-bodies and
    vice versa (Newton's third law: shared geometry, opposite signs, each
    side weighted by the other's mass).  This is the per-rotation building
    block of the multi-chip N3L ring (``parallel/ring.py``): neither the
    reference (single-GPU, ``kernel.cu:99-114``) nor its tiling has a
    cross-device analog.

    Both sides pad independently with zero-mass ghosts (inert both ways:
    m=0 kills a ghost's pull as a source AND its scatter as a receiver's
    counterpart), so no masks are needed for ragged sizes.
    """
    if variant not in SYM_VARIANTS:
        raise ValueError(
            f"variant must be one of {SYM_VARIANTS}, got {variant!r}")
    na, nb_real = pos_a.shape[0], pos_b.shape[0]
    schedule = resolve_schedule(schedule, variant)
    block_u = resolve_block_u(block_u, nb_real, variant)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb_b, panels = _rect_panel_layout(nb_real, block_u, panel_nb)
    _validate_sym_blocks(block_i, block_u, nb_b, schedule, variant)
    na_pad = round_up(na, block_i)
    nb_pad = panels * nb_b * block_u
    pos_a_p = jnp.pad(pos_a, ((0, na_pad - na), (0, 0)))
    mass_a_p = jnp.pad(mass_a, (0, na_pad - na))
    pos_b_p = jnp.pad(pos_b, ((0, nb_pad - nb_real), (0, 0)))
    mass_b_p = jnp.pad(mass_b, (0, nb_pad - nb_real))
    acc_a, acc_b = _rect_sym_padded(
        pos_a_p, mass_a_p, pos_b_p, mass_b_p, float(eps2), block_i,
        block_u, nb_b, variant, interpret, schedule)
    return acc_a[:na], acc_b[:nb_real]


@functools.partial(
    jax.jit, static_argnames=("eps2", "block_i", "block_u", "panel_nb",
                              "variant", "interpret", "schedule"))
def _sym_self_batch_prog(pos_flat, mass_p, acc_flat, a_ids, eps2, block_i,
                         block_u, panel_nb, variant, interpret,
                         schedule="classic"):
    """One device program for the per-panel SELF sweeps (diagonal +
    triangular), scanning dynamic panel offsets — compile-once, and only
    one iteration's temporaries are live at a time.

    Layout contract (the large-N memory walls, both measured at N=16.8M):
    positions and the accumulator travel FLAT ``(3N,)`` — dynamic
    slice/update on an ``(N, 3)`` array makes XLA materialize it in
    T(8,128) tiled layout, padding the minor dim 3->128 (42.7x: two
    8.06 GiB copies = OOM); 1-D T(1024) layout is compact, and panel
    offsets ``3*a*m`` stay tile-aligned.  Narrow ``(m, 1)``/``(1, m)``
    mass operands are likewise built per slice (a full-length ``(N, 1)``
    column lane-pads 128x = 8.4 GiB)."""
    m = panel_nb * block_u

    def body(acc, a):
        o = 3 * a * m
        pa = jax.lax.dynamic_slice(pos_flat, (o,), (3 * m,)).reshape(m, 3)
        ma = jax.lax.dynamic_slice(mass_p, (a * m,), (m,))
        paT = pa.T
        part = _diag_call(pa, paT, ma[None, :], eps2=eps2, nb=panel_nb,
                          block_i=block_i, block_u=block_u,
                          interpret=interpret)
        if panel_nb >= 3:
            acc_i, acc_jT = _sym_call(
                pa, ma[:, None], paT, ma[None, :], eps2=eps2, nb=panel_nb,
                block_i=block_i, block_u=block_u, variant=variant,
                interpret=interpret, schedule=schedule)
            part = part + _inv_mass_scale(acc_i + _unscatter(acc_jT), ma,
                                          variant)
        cur = jax.lax.dynamic_slice(acc, (o,), (3 * m,))
        acc = jax.lax.dynamic_update_slice(
            acc, cur + part.reshape(-1), (o,))
        return acc, None

    acc, _ = jax.lax.scan(body, acc_flat, a_ids)
    return acc


@functools.partial(
    jax.jit, static_argnames=("eps2", "block_i", "block_u", "panel_nb",
                              "variant", "interpret", "schedule"))
def _sym_pair_batch_prog(pos_flat, mass_p, acc_flat, a_ids, b_ids, w, eps2,
                         block_i, block_u, panel_nb, variant, interpret,
                         schedule="classic"):
    """Compile-ONCE batched cross-panel program: processes ``len(a_ids)``
    panel pairs at DYNAMIC offsets via ``lax.scan``.  Every batch of every
    step reuses this single compilation (a static-tuple grouping would
    compile a distinct XLA program per group — quadratically many at
    large N).
    Padding items carry weight 0 (their kernel output is computed and
    discarded; <= batch-1 wasted items per force evaluation).
    Positions/accumulator travel FLAT — see ``_sym_self_batch_prog`` for
    the measured (N, 3)-layout OOM wall this avoids."""
    m = panel_nb * block_u

    def body(acc, item):
        a, b, wt = item
        oa = 3 * a * m
        ob = 3 * b * m
        pa = jax.lax.dynamic_slice(pos_flat, (oa,), (3 * m,)).reshape(m, 3)
        pb = jax.lax.dynamic_slice(pos_flat, (ob,), (3 * m,)).reshape(m, 3)
        ma = jax.lax.dynamic_slice(mass_p, (a * m,), (m,))
        mb = jax.lax.dynamic_slice(mass_p, (b * m,), (m,))
        acc_a, acc_bT = _rect_call(
            pa, ma[:, None], pb.T, mb[None, :], pb, mb[:, None],
            eps2=eps2, nb_b=panel_nb, block_i=block_i, block_u=block_u,
            variant=variant, interpret=interpret, schedule=schedule)
        acc_a = _inv_mass_scale(acc_a, ma, variant)
        acc_b = _inv_mass_scale(_unscatter(acc_bT), mb, variant)
        cur_a = jax.lax.dynamic_slice(acc, (oa,), (3 * m,))
        acc = jax.lax.dynamic_update_slice(
            acc, cur_a + wt * acc_a.reshape(-1), (oa,))
        cur_b = jax.lax.dynamic_slice(acc, (ob,), (3 * m,))
        acc = jax.lax.dynamic_update_slice(
            acc, cur_b + wt * acc_b.reshape(-1), (ob,))
        return acc, None

    acc, _ = jax.lax.scan(body, acc_flat, (a_ids, b_ids, w))
    return acc


def forces_pallas_sym_chunked(pos: jax.Array, mass: jax.Array, eps2: float,
                              block_i: int = 512,
                              block_u: "int | None" = None,
                              panel_nb: "int | None" = None,
                              variant: str = "vpu",
                              interpret: "bool | None" = None,
                              max_prog_interactions: float = DEFAULT_PROG_CAP,
                              progress=None,
                              schedule: "str | None" = None) -> jax.Array:
    """``forces_pallas_sym`` dispatched as MULTIPLE device programs, each
    bounded to ~``max_prog_interactions`` interactions (the bench metric's
    unit: a full eval costs N², each unordered pair delivering 2).

    One fused force evaluation at N=4M runs ~71 s of kernel time in a
    single XLA program — past the point where an execution-time-limited
    runtime (the axon relay kills ~60 s programs) or a preemptible
    production schedule can tolerate an unsplittable unit.  This driver
    splits the panel work into (a) ONE program for the per-panel self
    sweeps (cost grows only linearly in N) and (b) batches of cross-panel
    pairs dispatched through a single compile-once dynamic-offset program
    (``_sym_pair_batch_prog``), each batch sized to stay under the cap;
    the accumulator stays device-resident between programs, so the only
    per-program cost is dispatch latency.  Default cap 1.2e13 ≈ 45 s at
    the exact tier's measured ~266 G/s (N=4M exact = 1.76e13 total →
    ~2 bounded programs).

    Semantics identical to ``forces_pallas_sym`` (same kernels, same
    per-slice accumulation order).

    The (N, 3) <-> flat conversions here tile-copy at 42.7x on this
    stack (docs/PERF.md memory walls); above ~20M bodies use the flat
    API (``forces_pallas_sym_chunked_flat``) with flat state end to end.
    """
    n = pos.shape[0]
    out = forces_pallas_sym_chunked_flat(
        pos.reshape(-1), mass, eps2, block_i=block_i, block_u=block_u,
        panel_nb=panel_nb, variant=variant, interpret=interpret,
        max_prog_interactions=max_prog_interactions, progress=progress,
        schedule=schedule)
    return out.reshape(n, 3)


def forces_pallas_sym_chunked_flat(
        pos_flat: jax.Array, mass: jax.Array, eps2: float,
        block_i: int = 512, block_u: "int | None" = None,
        panel_nb: "int | None" = None, variant: str = "vpu",
        interpret: "bool | None" = None,
        max_prog_interactions: float = DEFAULT_PROG_CAP,
        progress=None, schedule: "str | None" = None) -> jax.Array:
    """Flat-operand core of the chunked dispatcher: positions enter and
    accelerations leave as row-major flat ``(3N,)`` arrays, so NO ``(N,3)``
    array ever exists on device.  This is the >20M-body mode: every
    program op consuming an ``(N, 3)`` array on this stack materializes a
    T(8,128) tiled copy at 42.7x (17.2 GB at N=32M — over HBM), while
    1-D arrays stay compact (docs/PERF.md memory walls).

    ``progress``: optional ``f(done, total, acc)`` called after each
    bounded program is DISPATCHED (`acc` = the running accumulator; a
    callback that wants real completion progress blocks on it, e.g.
    ``np.asarray(acc[:1])``).  At huge N one force evaluation spans many
    ~45 s programs (~95 at N=33.5M) while the client sits in an epoll
    sleep — this is the hook that makes that visible (a heartbeat, not a
    hang)."""
    if variant not in SYM_VARIANTS:
        raise ValueError(
            f"variant must be one of {SYM_VARIANTS}, got {variant!r}")
    n = mass.shape[0]
    if pos_flat.shape != (3 * n,):
        raise ValueError(
            f"pos_flat must be row-major (3N,) = ({3 * n},), got "
            f"{pos_flat.shape}")
    schedule = resolve_schedule(schedule, variant)
    block_u = resolve_block_u(block_u, n, variant)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if panel_nb is None:
        panel_nb = default_panel_nb(block_u)
    nb, panels = _panel_layout(n, block_u, panel_nb)
    _validate_sym_blocks(block_i, block_u, nb, schedule, variant)
    n_pad = panels * nb * block_u
    pad = n_pad - n
    pos_flat = jnp.pad(pos_flat, (0, 3 * pad))
    mass_p = jnp.pad(mass, (0, pad))

    m = nb * block_u
    acc = jnp.zeros_like(pos_flat)
    # Program 1: all per-panel self sweeps (diag + triangular), scanned at
    # dynamic offsets — total cost panels*m² interactions, linear in N
    # (~2 s at N=4M; reaches the 45 s cap only near N~90M).  Compiled once
    # per (N, geometry), bounded temporaries.
    acc = _sym_self_batch_prog(
        pos_flat, mass_p, acc, jnp.arange(panels, dtype=jnp.int32),
        float(eps2), block_i, block_u, nb, variant, interpret, schedule)
    # Programs 2..k: cross-panel pairs in lexicographic order (matching the
    # fused program's per-slice accumulation order), batched under the cap.
    # Each cross pair costs 2m² interactions (m² pairs, 2 interactions per
    # pair — the N²-per-eval bench unit).
    pairs = [(a, b) for a in range(panels) for b in range(a + 1, panels)]
    # ONE computation of the program count, shared by the progress total
    # and the batching below — if the cap policy changes, the heartbeat's
    # done/total cannot silently diverge from the actual dispatch count.
    per = max(1, int(max_prog_interactions // (2.0 * m * m)))
    n_prog = -(-len(pairs) // per) if pairs else 0
    n_total = 1 + n_prog
    if progress is not None:
        progress(1, n_total, acc)
    if pairs:
        # Split EVENLY into the fewest programs under the cap: every batch
        # gets the same static size (one compile) and total dummy padding
        # stays <= n_prog - 1 items.  (Padding every batch up to the cap
        # instead wasted up to a full batch of computed-and-discarded
        # items: 210 dummies = +30 s/step at N=4M exact.)
        batch = -(-len(pairs) // n_prog)
        done = 1
        for lo in range(0, len(pairs), batch):
            chunk = pairs[lo:lo + batch]
            npad = batch - len(chunk)
            # Pad with weight-0 dummies so every batch reuses ONE compile.
            chunk = chunk + [(0, 1)] * npad
            a_ids = jnp.asarray([p[0] for p in chunk], jnp.int32)
            b_ids = jnp.asarray([p[1] for p in chunk], jnp.int32)
            w = jnp.asarray([1.0] * (len(chunk) - npad) + [0.0] * npad,
                            pos_flat.dtype)
            acc = _sym_pair_batch_prog(
                pos_flat, mass_p, acc, a_ids, b_ids, w, float(eps2),
                block_i, block_u, nb, variant, interpret, schedule)
            done += 1
            if progress is not None:
                progress(done, n_total, acc)
    return acc[:3 * n]


def forces_pallas_sym(pos: jax.Array, mass: jax.Array, eps2: float,
                      block_i: int = 512, block_u: "int | None" = None,
                      panel_nb: "int | None" = None,
                      variant: str = "vpu",
                      interpret: "bool | None" = None,
                      schedule: "str | None" = None) -> jax.Array:
    """Softened all-pairs accelerations, each pair computed once (N3L).

    pos: (N,3) f32; mass: (N,) f32.  N pads with zero-mass ghosts to
    panels x panel_nb x block_u; ghosts are inert on BOTH sides (m_j = 0
    kills their pull, m_i = 0 kills their scatter contribution), so no
    masks are needed anywhere.

    ``schedule``: grid-schedule knob for the VPU exact tiers (None = the
    per-variant default, see ``SYM_SCHEDULES``/``resolve_schedule``).
    """
    if variant not in SYM_VARIANTS:
        raise ValueError(
            f"variant must be one of {SYM_VARIANTS}, got {variant!r}")
    n = pos.shape[0]
    schedule = resolve_schedule(schedule, variant)
    block_u = resolve_block_u(block_u, n, variant)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if panel_nb is None:
        panel_nb = default_panel_nb(block_u)
    nb, panels = _panel_layout(n, block_u, panel_nb)
    _validate_sym_blocks(block_i, block_u, nb, schedule, variant)
    n_pad = panels * nb * block_u
    pad = n_pad - n
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    mass_p = jnp.pad(mass, (0, pad))
    acc = _forces_sym_padded(pos_p, mass_p, float(eps2), block_i, block_u,
                             nb, variant, interpret, schedule)
    return acc[:n]
