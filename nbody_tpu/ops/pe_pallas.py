"""Pallas pair-potential kernel — device-side energy accounting at the
force kernels' throughput class.

Rebuilds the energy side of the validation contract (the reference has no
conservation accounting at all, SURVEY.md §5; the drift gates in
BASELINE.md are defined over the softened pair potential
``-1/2 sum_{i!=j} m_i m_j (|r|^2 + eps2)^{-1/2}``).  The XLA pair sweep
(`models/energy.py::_pe_rows`) measures ~7e10 pairs/s; this kernel runs
the same sweep VMEM-tiled at the force kernels' rate (~11 VPU
flops/pair), which is what makes energy tracking practical at the
N >= 4M scales `run_steps_multiprog` unlocked.

Design notes:
- NO masks and NO index offsets anywhere: the sweep includes self-pairs
  (each contributes exactly ``m_i^2 * rsqrt(eps2)`` — d2 == eps2 at
  r=0), and the caller subtracts that closed-form total in float64.
  Accuracy class: the self term rides in the f32 row accumulator, so the
  relative error scales with self/pair-sum ≈ ``rsqrt(eps2)·d_typ/N`` —
  ~3e-5 at N=3k (measured), ~3e-7 at the N >= 1M scales this fast tier
  is for.  The XLA path (`models/energy.py::_pe_rows`, index-masked,
  ~4e-9) remains the exact-tier fallback; both are far inside the
  1e-3-scale drift gates.
- Zero-mass ghost padding on both sides (inert terms), as everywhere.
- Operands are plain ``pos``/``posT``/``mass`` streams only (the
  platform operand-ingestion rule, docs/PERF.md; retested round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.state import round_up


def _pe_kernel(pos_ref, mass_col_ref, posT_ref, mass_row_ref, out_ref, *,
               eps2):
    jb = pl.program_id(1)

    @pl.when(jb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pos_ref[:]                              # (BI, 3)
    xjT = posT_ref[:]                            # (3, U)
    dx = xjT[0:1, :] - xi[:, 0:1]
    dy = xjT[1:2, :] - xi[:, 1:2]
    dz = xjT[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    inv = jax.lax.rsqrt(d2)                      # (BI, U)
    row = jnp.sum(mass_row_ref[:] * inv, axis=1, keepdims=True)
    out_ref[:] += mass_col_ref[:] * row          # (BI, 1)


@functools.partial(
    jax.jit, static_argnames=("eps2", "block_i", "block_u", "interpret"))
def _pe_rows_padded(pos_r, mass_r, posT_all, mass_row_all, eps2, block_i,
                    block_u, interpret):
    nr = pos_r.shape[0]
    n = posT_all.shape[1]
    grid = (nr // block_i, n // block_u)
    out = pl.pallas_call(
        functools.partial(_pe_kernel, eps2=eps2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, 3), lambda ib, jb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, 1), lambda ib, jb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_u), lambda ib, jb: (0, jb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u), lambda ib, jb: (0, jb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, 1), lambda ib, jb: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=11 * nr * n, bytes_accessed=(nr + n) * 4 * 8,
            transcendentals=nr * n),
        interpret=interpret,
    )(pos_r, mass_r[:, None], posT_all, mass_row_all)
    return jnp.sum(out, dtype=jnp.float32)


def pe_rows_pallas(pos_rows, mass_rows, pos_all, mass_all, eps2: float,
                   block_i: int = 256, block_u: int = 2048,
                   interpret: "bool | None" = None):
    """Sum of ``m_i m_j (|r|^2+eps2)^{-1/2}`` over the given rows against
    ALL bodies — INCLUDING each row's self term (subtract
    ``sum(m_rows^2) * eps2**-0.5`` on the caller side; exact in f64).

    Both sides pad with zero-mass ghosts.  Returns a device f32 scalar.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nr, n = pos_rows.shape[0], pos_all.shape[0]
    nr_pad = round_up(nr, block_i)
    n_pad = round_up(n, block_u)
    pos_r = jnp.pad(pos_rows, ((0, nr_pad - nr), (0, 0)))
    mass_r = jnp.pad(mass_rows, (0, nr_pad - nr))
    posT = jnp.pad(pos_all, ((0, n_pad - n), (0, 0))).T
    mass_row = jnp.pad(mass_all, (0, n_pad - n))[None, :]
    return _pe_rows_padded(pos_r, mass_r, posT, mass_row, float(eps2),
                           block_i, block_u, interpret)
