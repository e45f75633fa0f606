"""Bench-only ablation variants of the pair-symmetric kernels.

Reference provenance: these ablate the rebuild of the reference's tiled
all-pairs force kernel (kernel.cu:80-130, the force law at kernel.cu:9-29)
— the reference ships no ablation harness of its own.

These measurement kernels isolate individual costs of the production N3L
kernels (``forces_pallas_sym.py``) and produce *deliberately wrong or
partial physics* — they exist to price mechanisms, not to simulate:

- ``vpu_noj``  — i-side accumulation only (prices the j-side scatter:
  the WRONG-results ablation, the j half of every pair is dropped);
- ``vpu_fix0`` — j-side scatter to a FIXED superblock slot (prices the
  dynamic-offset RMW against a constant-address RMW; results wrong);
- ``vpu_rc``   — exact physics with the coordinate differences RECOMPUTED
  per component in the accumulate stage (liveness ablation: peak working
  set ~3 instead of ~5 (BI,U) buffers, +3 sub flops/pair).

They are registered into the production factories' ablation registries by
``enable()`` and are NOT reachable through the public dispatch otherwise
(VERDICT round 2 #8: keep the hot path auditable).  Usage in sweeps:

    from nbody_tpu.ops import ablation_sym
    ablation_sym.enable()
    forces_pallas_sym(pos, mass, eps2, variant="vpu_rc", ...)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import forces_pallas_sym as _fps
from .forces_pallas_sym import (_accum_i_turbo, _accum_j_turbo,
                                _accum_i_vpu, _accum_j_vpu, _pair_terms,
                                _scatter_add)

ABLATION_NAMES = ("vpu_noj", "vpu_fix0", "vpu_rc",
                  "tmm_full", "tmm_noscat", "tmm_noj", "tmm_nomm")

# Turbo MXU-chain ablations (round 5, VERDICT r4 weak #5 — the turbo SOL
# settlement).  The production turbo tile is VPU pair-terms + two bf16
# accumulate-matmuls consuming the VPU-produced `f` in the SAME grid
# step; these four variants peel the chain to price each pass.  What the
# measurements settled (BASELINE.md turbo-SOL settlement + addendum):
# the LANE-contracted i-side matmul is fully hidden under the VPU stream
# (Mosaic pipelines it against its own producer — the pre-settlement
# assumption that it could not was wrong), while the j-side pass (fj
# cast + xi8 pack + SUBLANE-contracted matmul) costs 17% of tile time
# and is irreducible: deferring it one grid step (`turbop`,
# forces_pallas_sym.py) measured -10.7%, and every shared-weight
# reformulation (turbof/turbo2) also loses.
#
#   tmm_full   — full turbo math, but with the (U,3) j-positions
#                RECONSTRUCTED in-kernel by transposing the (3,U) tile
#                (vpu operand signature).  Production-turbo minus
#                tmm_full prices that reconstruction (the control).
#   tmm_noscat — both matmuls, j-side added to a FIXED slot (prices the
#                dynamic-offset scatter RMW; results wrong).
#   tmm_noj    — i-side matmul only (prices the j matmul pass).
#   tmm_nomm   — pair terms + both bf16 casts, NO matmuls; the casts are
#                consumed by a 1-flop/pair row reduce so Mosaic cannot
#                dead-code them (prices the un-overlappable VPU floor;
#                results wrong).


def _accum_both_vpu_rc(xi, xjT, mass_row_j, mass_col_i, eps2):
    """Liveness-reduced exact tile: the (BI,U) coordinate differences are
    recomputed per component in the accumulate stage instead of staying
    live across it.  Returns (acc_i (BI,3), acc_j (3,U) positive
    magnitude; caller negates)."""
    d2 = ((xjT[0:1, :] - xi[:, 0:1]) * (xjT[0:1, :] - xi[:, 0:1])
          + (xjT[1:2, :] - xi[:, 1:2]) * (xjT[1:2, :] - xi[:, 1:2])
          + (xjT[2:3, :] - xi[:, 2:3]) * (xjT[2:3, :] - xi[:, 2:3]) + eps2)
    inv = jax.lax.rsqrt(d2 * d2 * d2)
    fi = mass_row_j * inv
    fj = mass_col_i * inv
    ai, aj = [], []
    for c in range(3):
        d = xjT[c:c + 1, :] - xi[:, c:c + 1]
        ai.append(jnp.sum(fi * d, axis=1, keepdims=True))
        aj.append(jnp.sum(fj * d, axis=0, keepdims=True))
    return (jnp.concatenate(ai, axis=1), jnp.concatenate(aj, axis=0))


def _tile_turbo_mm(variant, xi, xjT, mass_row, mass_col, eps2,
                   acc_i_ref, acc_jT_ref, j_sb):
    """Turbo MXU-chain ablation tile (vpu operand signature; see the
    ABLATION_NAMES note)."""
    block_i, block_u = xi.shape[0], xjT.shape[1]
    dx, dy, dz, fi, fj = _pair_terms(xi, xjT, mass_row, mass_col, eps2)
    del dx, dy, dz
    if variant == "tmm_nomm":
        fb_i = fi.astype(jnp.bfloat16)
        fb_j = fj.astype(jnp.bfloat16)
        s = (jnp.sum(fb_i.astype(jnp.float32), axis=1, keepdims=True)
             + jnp.sum(fb_j.astype(jnp.float32), axis=1, keepdims=True))
        acc_i_ref[:] += s * jnp.ones((1, 3), jnp.float32)
        return
    pos_j = xjT.T                       # (U, 3); priced by tmm_full
    acc_i_ref[:] += _accum_i_turbo(fi, xi, pos_j, block_u)
    if variant == "tmm_noj":
        return
    aj = _accum_j_turbo(fj, xi, xjT, block_i)
    if variant == "tmm_noscat":
        acc_jT_ref[0] = acc_jT_ref[0] + aj
    else:                               # tmm_full
        _scatter_add(acc_jT_ref, j_sb, aj)


def _tile(variant, xi, xjT, mass_row, mass_col, eps2, acc_i_ref,
          acc_jT_ref, j_sb):
    """Shared tile body for all the ablations (vpu operand signature)."""
    if variant.startswith("tmm_"):
        _tile_turbo_mm(variant, xi, xjT, mass_row, mass_col, eps2,
                       acc_i_ref, acc_jT_ref, j_sb)
        return
    if variant == "vpu_rc":
        ai, aj = _accum_both_vpu_rc(xi, xjT, mass_row, mass_col, eps2)
        acc_i_ref[:] += ai
        _scatter_add(acc_jT_ref, j_sb, -aj)
        return
    dx, dy, dz, fi, fj = _pair_terms(xi, xjT, mass_row, mass_col, eps2)
    acc_i_ref[:] += _accum_i_vpu(dx, dy, dz, fi)
    if variant == "vpu_fix0":
        acc_jT_ref[0] = acc_jT_ref[0] - _accum_j_vpu(dx, dy, dz, fj)
    # vpu_noj: drop the j side entirely.


def _make_tri(variant):
    def factory(eps2, nb, sub, block_i, block_u):
        def kernel(pos_i_ref, mass_col_ref, posT_ref, mass_row_ref,
                   acc_i_ref, acc_jT_ref):
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

            j_sb = jax.lax.rem(i_sb + 1 + dd, jnp.int32(nb))
            _tile(variant, pos_i_ref[:], posT_ref[:], mass_row_ref[:],
                  mass_col_ref[:], eps2, acc_i_ref, acc_jT_ref, j_sb)
        return kernel
    return factory


def _make_rect(variant):
    def factory(eps2, block_i, block_u):
        def kernel(pos_a_ref, mass_col_ref, posT_b_ref, mass_row_ref,
                   acc_a_ref, acc_bT_ref):
            ia = pl.program_id(0)
            jb = pl.program_id(1)

            @pl.when(jnp.logical_and(ia == 0, jb == 0))
            def _():
                acc_bT_ref[...] = jnp.zeros_like(acc_bT_ref)

            @pl.when(jb == 0)
            def _():
                acc_a_ref[:] = jnp.zeros_like(acc_a_ref)

            _tile(variant, pos_a_ref[:], posT_b_ref[:], mass_row_ref[:],
                  mass_col_ref[:], eps2, acc_a_ref, acc_bT_ref, jb)
        return kernel
    return factory


def enable() -> None:
    """Register the ablation kernels with the production factories and make
    the names dispatchable through ``forces_pallas_sym(variant=...)``."""
    for name in ABLATION_NAMES:
        _fps.ABLATION_SYM_KERNELS[name] = _make_tri(name)
        _fps.ABLATION_RECT_KERNELS[name] = _make_rect(name)
    extra = tuple(n for n in ABLATION_NAMES
                  if n not in _fps.SYM_VARIANTS)
    _fps.SYM_VARIANTS = _fps.SYM_VARIANTS + extra
