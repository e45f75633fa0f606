"""Pallas VMEM-tiled all-pairs force kernel — the TPU-native analog of the
reference's shared-memory tiled CUDA kernel (``kernel.cu:80-130``).

Mapping (SURVEY.md section 2.2):

- CUDA thread block staging a j-tile into shared memory + ``__syncthreads``
  (``kernel.cu:99-113``)  ==>  Pallas ``BlockSpec`` streaming j-tiles
  HBM->VMEM across grid steps, double-buffered by the Pallas pipeline.
- one-thread-per-body serial sweep  ==>  an (BI x BJ) vectorized interaction
  block on the VPU; the i-block's accumulator lives in VMEM across the whole
  j sweep (the analog of the per-thread register accumulator).
- ``1/sqrtf(distSqrt^3)`` (``kernel.cu:20``)  ==>  ``jax.lax.rsqrt`` on the
  VPU.
- launch-config / shared-memory-capacity checks (``kernel.cu:632-641``)  ==>
  VMEM-budget validation in the wrapper.

Two accumulation strategies (both exact w.r.t. the reference force law):

- ``vpu`` (default): a_i += f*dx summed on the VPU. The self-pair vanishes
  exactly via r=0, like the reference (kernel.cu:17-27).
- ``mxu``: the (BI,BJ) factor matrix is contracted against the j-tile
  positions on the MXU (``acc = f @ xj - xi * rowsum(f)``), moving 6 of the
  ~19 flops/pair off the VPU. Requires masking the diagonal block (the
  self-factor m_i*rsqrt(eps2^3) cancels only in exact arithmetic).

Layout: positions are passed both as (N,3) [i-side] and transposed (3,N)
[j-side] so both broadcast shapes (BI,1) and (1,BJ) are natural slices with
no in-kernel transposes; the (3,N) copy is refreshed once per step by XLA (a
cheap transpose vs the O(N^2) sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.state import round_up

# VMEM ceiling for the kernel working set (per-core VMEM is ~16 MB
# less pipeline overheads).  The analog of the reference's
# sharedMemPerBlock check (kernel.cu:637-641).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _validate_blocks(ni_pad: int, block_i: int, block_j: int,
                     nj_pad: "int | None" = None):
    nj_pad = ni_pad if nj_pad is None else nj_pad
    if block_i % 8 != 0:
        raise ValueError(f"block_i must be a multiple of 8, got {block_i}")
    if block_j % 128 != 0:
        raise ValueError(f"block_j must be a multiple of 128, got {block_j}")
    if ni_pad % block_i or nj_pad % block_j:
        raise ValueError(
            f"padded Ni={ni_pad}/Nj={nj_pad} must divide block_i={block_i} "
            f"and block_j={block_j}")
    # Working set: ~4 live (BI,BJ) f32 temporaries + i/j blocks + accumulator,
    # x2 for pipeline double-buffering of streamed operands.
    interaction = 4 * block_i * block_j * 4
    blocks = 2 * (block_i * 3 + 3 * block_j + block_j + block_i * 3) * 4
    if interaction + blocks > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"block_i={block_i} x block_j={block_j} needs ~"
            f"{(interaction + blocks) / 1e6:.1f} MB VMEM > budget "
            f"{_VMEM_BUDGET_BYTES / 1e6:.1f} MB; shrink the blocks")


def _force_kernel_vpu(pos_i_ref, posT_j_ref, mass_j_ref, acc_ref, *, eps2):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xi = pos_i_ref[:]                      # (BI, 3)
    xj = posT_j_ref[:]                     # (3, BJ)
    m = mass_j_ref[:]                      # (1, BJ)

    dx = xj[0:1, :] - xi[:, 0:1]           # (BI, BJ)
    dy = xj[1:2, :] - xi[:, 1:2]
    dz = xj[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    f = m * jax.lax.rsqrt(d2 * d2 * d2)    # (BI, BJ)

    ax = jnp.sum(f * dx, axis=1, keepdims=True)   # (BI, 1)
    ay = jnp.sum(f * dy, axis=1, keepdims=True)
    az = jnp.sum(f * dz, axis=1, keepdims=True)
    acc_ref[:] += jnp.concatenate([ax, ay, az], axis=1)


def _force_kernel_mxu(pos_i_ref, posT_j_ref, mass_j_ref, acc_ref, *,
                      eps2, block_i, block_j):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xi = pos_i_ref[:]                      # (BI, 3)
    xj = posT_j_ref[:]                     # (3, BJ)
    m = mass_j_ref[:]                      # (1, BJ)

    dx = xj[0:1, :] - xi[:, 0:1]
    dy = xj[1:2, :] - xi[:, 1:2]
    dz = xj[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    f = m * jax.lax.rsqrt(d2 * d2 * d2)    # (BI, BJ)

    # Mask the self-pair: through the matmul decomposition the diagonal
    # factor would only cancel in exact arithmetic (see module docstring).
    row = i * block_i + jax.lax.broadcasted_iota(
        jnp.int32, (block_i, block_j), 0)
    col = j * block_j + jax.lax.broadcasted_iota(
        jnp.int32, (block_i, block_j), 1)
    f = jnp.where(row == col, 0.0, f)

    # (BI,BJ) @ (BJ,3) on the MXU + rank-1 correction.  Precision must be
    # HIGHEST: the MXU's default single-pass bf16 rounding of 1e5-scale
    # positions (8-bit mantissa => ~4e2 absolute error) would swamp the
    # forces; the 3-pass fp32 emulation is still far cheaper than doing
    # these 6 flops/pair on the VPU.
    acc_ref[:] += (
        jax.lax.dot_general(
            f, xj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        - xi * jnp.sum(f, axis=1, keepdims=True)
    )


@functools.partial(
    jax.jit, static_argnames=("eps2", "block_i", "block_j", "use_mxu",
                              "interpret"))
def _forces_pallas_padded(pos, posT, mass_row, eps2, block_i, block_j,
                          use_mxu, interpret):
    """Tiled sweep of the (Ni x Nj) interaction block.  ``pos`` is the i-side
    (Ni,3); ``posT``/``mass_row`` are the j-side (3,Nj)/(1,Nj).  Square
    self-interaction is the Ni==Nj case; the rectangular case is the
    building block of the multi-chip ring sweep."""
    ni_pad = pos.shape[0]
    nj_pad = posT.shape[1]
    grid = (ni_pad // block_i, nj_pad // block_j)

    if use_mxu:
        kernel = functools.partial(
            _force_kernel_mxu, eps2=eps2, block_i=block_i, block_j=block_j)
    else:
        kernel = functools.partial(_force_kernel_vpu, eps2=eps2)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, 3), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ni_pad, 3), pos.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * ni_pad * nj_pad,
            bytes_accessed=(ni_pad * 3 + nj_pad * 3 + nj_pad) * 4,
            transcendentals=ni_pad * nj_pad,
        ),
        interpret=interpret,
    )(pos, posT, mass_row)


def rect_forces_pallas(pos_i: jax.Array, pos_j: jax.Array, mass_j: jax.Array,
                       eps2: float, block_i: int = 256, block_j: int = 1024,
                       interpret: "bool | None" = None) -> jax.Array:
    """Forces of body set j on body set i via the tiled kernel (VPU
    accumulation — self-pairs vanish by r=0, so it is safe when the sets
    overlap, e.g. the diagonal step of the ring sweep).

    Shapes must already be block multiples (the ring path pads shards once,
    up front).  (Ni,3),(Nj,3),(Nj,) -> (Ni,3).
    """
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    while block_i > 8 and ni < block_i:
        block_i //= 2
    while block_j > 128 and nj < block_j:
        block_j //= 2
    if ni % block_i or nj % block_j:
        raise ValueError(
            f"rect_forces_pallas requires pre-padded shapes: Ni={ni} %% "
            f"block_i={block_i}, Nj={nj} %% block_j={block_j} must be 0")
    _validate_blocks(ni, block_i, block_j, nj_pad=nj)
    return _forces_pallas_padded(
        pos_i, pos_j.T, mass_j[None, :], float(eps2), block_i, block_j,
        False, interpret)


def forces_pallas(pos: jax.Array, mass: jax.Array, eps2: float,
                  block_i: int = 256, block_j: int = 1024,
                  use_mxu: bool = False,
                  interpret: "bool | None" = None) -> jax.Array:
    """Softened all-pairs accelerations via the tiled Pallas kernel.

    pos: (N,3) f32; mass: (N,) f32. N is padded internally with zero-mass
    ghosts to a block multiple (the analog of the reference's tid>=N guards,
    kernel.cu:90-92, made unnecessary by mass-0 padding).
    """
    n = pos.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    multiple = max(block_i, block_j)
    n_pad = round_up(n, multiple)
    # Shrink oversized blocks for small systems instead of erroring.
    while block_i > 8 and n_pad < block_i:
        block_i //= 2
    while block_j > 128 and n_pad < block_j:
        block_j //= 2
    n_pad = round_up(n, max(block_i, block_j))
    _validate_blocks(n_pad, block_i, block_j)

    pad = n_pad - n
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    mass_p = jnp.pad(mass, (0, pad))
    posT = pos_p.T                     # (3, N) j-side layout
    mass_row = mass_p[None, :]         # (1, N)
    acc = _forces_pallas_padded(
        pos_p, posT, mass_row, float(eps2), block_i, block_j, use_mxu,
        interpret)
    return acc[:n]
