"""In-kernel RDMA ring force sweep — compute + communication fused into
ONE Pallas kernel per chip (v2: HBM-resident shards, full variant ladder).

The XLA rings (``ring.py``) alternate ``ppermute`` and kernel launches at
the JAX level; every hop is a separate program-level collective with its
own launch/fusion boundary.  Here the entire P-phase ring sweep lives
inside a single ``pallas_call`` per device: shards move between neighbors
with explicit inter-chip DMAs (``pltpu.make_async_remote_copy``) — the
TPU analog of a hand-written NCCL ring, and the rebuild's flagship
multi-chip design (SURVEY.md section 2.3; the reference itself is
single-GPU: ``kernel.cu:96-114`` streams tiles through shared memory,
here shards stream around the ICI ring through HBM).

v2 (round 4, verdict r3 #3) lifts every v1 scope cap:

- **HBM-resident shards, streamed tiles**: operands, the accumulator,
  and the rotating payload live in ``pl.ANY`` (compiler-placed, HBM at
  scale); compute stages (BI, 3) i-blocks and (8, U) payload tiles into
  VMEM with local async copies.  The v1 whole-shard-in-VMEM cap
  (~8-12k bodies/chip) is gone — any shard size whose padded blocks
  divide it runs.
- **The full sym variant ladder**: all six pair-symmetric tile kernels
  (vpu / vpu2 / turbo / turbof / turbo2 / mxu) ride the ring, reusing
  the production tile math from ``ops.forces_pallas_sym`` (transposed
  pack twins below derive every (U, *) operand from the payload's
  (3, U) rows IN-KERNEL — the platform operand-ingestion bug,
  docs/PERF.md, forbids XLA-premade packed operands).
- **Cross-chip N3L**: the sym tiers sweep HALF the ring.  The payload
  carries a travel accumulator (rows 4:7): at each phase the host chip
  computes its i-shard against the visiting shard TWO-SIDED, keeping the
  i-side and folding the j-side into the travel rows before forwarding;
  after floor((P-1)/2) hops one direct RDMA ships each travel partial
  home (even P adds the self-mirrored antipodal phase, computed
  one-sided on both owners — same decomposition as
  ``ring.py::ring_forces_local_sym``).  One-sided impls (``pallas``,
  ``pallas_turbo``) sweep the full P-1 phases with data-only payloads.

Protocol (per device; D = data hops = floor((P-1)/2) for odd P, P/2 for
even P, P-1 one-sided):

- ``comm`` is a double-buffered ``pl.ANY`` scratch of shape (2, 8, C):
  rows 0:3 posT, row 3 mass, rows 4:7 travel accumulator, row 7 pad.
  Phase d's payload (origin ``me - d``) occupies slot ``d % 2``.
- Phase 0 packs the chip's own payload into slot 0 (travel rows zeroed)
  and runs the SELF sweep (full one-sided C x C; self-pairs vanish via
  r=0 under softening — the ghost-padding contract).
- Phase d (1..D): consume one ack from the right neighbor (its slot
  ``d % 2`` is free), forward slot ``(d-1) % 2`` to the right neighbor's
  slot ``d % 2``, wait send+recv, emit one ack to the left neighbor
  (my slot ``(d-1) % 2`` is now free), then compute against slot
  ``d % 2`` — two-sided (mutating the travel rows) for sym phases
  1..half, one-sided for the even-P antipodal phase and all one-sided-
  family phases.
- Ack accounting is exactly balanced: one prophylactic ack before the
  loop (slot 1 starts free), one ack per phase, one drain wait after the
  last phase — every semaphore returns to zero, so repeated kernel
  invocations (fori_loop steps) cannot corrupt each other.
- Return hop: slot ``D % 2`` rows 4:8 RDMA directly home to device
  ``(me - D) mod P`` (distance D, not a neighbor — ICI routes it); the
  wrapper adds ``travel[0:3].T`` and applies the mass-scaled variants'
  1/m post-scale (``_inv_mass_scale``) over the combined raw sum.

Sequencing note: v2 is deliberately SEQUENTIAL per phase (send, wait,
compute) — correctness and capability first; the measured overlap step
(forward the immutable data rows on receipt so they race ahead of the
compute wavefront, trailing the travel rows one phase behind) is a
hardware-gated follow-up recorded in ROADMAP.md, since no multi-chip
hardware exists here to measure either variant.

Force law is the universal contract (``kernel.cu:9-29``): d2 = |r|^2 +
eps2, inv = rsqrt(d2^3), no i != j guard.  Cannot be performance-
measured on this relay (1 real chip); correctness is oracle-gated on
8/5/4/3/2/1-device interpret-mode CPU meshes (tests/test_rdma_ring.py),
the driver's ``dryrun_multichip`` runs it end-to-end, and the P=1 branch
is compile-spot-checked on the real chip (interpret mode does NOT catch
the platform bug or Mosaic lowering rejections; the P>1 Mosaic lowering
additionally requires the collective barrier prologue — that is what the
real-chip check of v1 surfaced, kept here).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..ops.forces_pallas_sym import (_accum_i_vpu, _accum_j_turbo,
                                     _accum_j_turbo2, _accum_j_vpu,
                                     _bf16_split, _inv_mass_scale,
                                     _mass_folded_pack, _pack8,
                                     _pair_products_sym, _pair_terms)
from .mesh import SHARD_AXIS

# One-sided impls that ride the RDMA ring with data-only payloads over
# the full P-1 phases (their accuracy twins of ring_forces_local).
_RDMA_ONE_SIDED = {"pallas": "vpu", "pallas_turbo": "turbo"}


# --------------------------------------------------------------------------
# Transposed pack twins: the payload carries posT (3, U) rows, and the
# platform bug (docs/PERF.md) mandates deriving everything else in-kernel
# — these build the (8, U) packs directly from the transposed rows so no
# in-kernel (3, U) -> (U, 3) transpose is ever needed.
# --------------------------------------------------------------------------

def _pack8T(xT):
    """[x_hi; x_lo; 1; 0] bf16 rows: (3, U) -> (8, U)."""
    hi, lo = _bf16_split(xT)
    u = xT.shape[1]
    return jnp.concatenate(
        [hi, lo, jnp.ones((1, u), jnp.bfloat16),
         jnp.zeros((1, u), jnp.bfloat16)], axis=0)


def _mass_folded_packT(xT, m_row):
    """[P_hi; P_lo; m_hi; m_lo] bf16 rows with P = m*x: (3, U) -> (8, U)."""
    p = m_row * xT
    ph, plo = _bf16_split(p)
    mh, ml = _bf16_split(m_row)
    return jnp.concatenate([ph, plo, mh, ml], axis=0)


def _accum_i_turbo_T(fi, xi, xjT):
    """i-side turbo accumulate against the TRANSPOSED pack: contract the
    U axis of both operands — same result as ``_accum_i_turbo``."""
    xj8T = _pack8T(xjT)                                    # (8, U)
    out = jax.lax.dot_general(
        fi.astype(jnp.bfloat16), xj8T, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BI, 8)
    return (out[:, 0:3] + out[:, 3:6]) - xi * out[:, 6:7]


def _accum_i_turbo2_T(inv_bf16, xi, xjT, mass_row_j):
    xj8mT = _mass_folded_packT(xjT, mass_row_j)            # (8, U)
    out = jax.lax.dot_general(
        inv_bf16, xj8mT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BI, 8)
    return (out[:, 0:3] + out[:, 3:6]) - xi * (out[:, 6:7] + out[:, 7:8])


def _accum_both_turbof_T(fb, xi, xjT, block_i):
    xj8T = _pack8T(xjT)
    out = jax.lax.dot_general(
        fb, xj8T, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BI, 8)
    ai = (out[:, 0:3] + out[:, 3:6]) - xi * out[:, 6:7]
    xi8 = _pack8(xi, block_i)
    out8 = jax.lax.dot_general(
        xi8, fb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (8, U)
    aj = (out8[0:3, :] + out8[3:6, :]) - xjT * out8[6:7, :]
    return ai, aj


def _accum_both_mxu_T(inv, xi, xjT, mass_col_i, mass_row_j, block_i):
    ih, il = _bf16_split(inv)
    xj8mT = _mass_folded_packT(xjT, mass_row_j)
    dn_i = (((1,), (1,)), ((), ()))
    out = (jax.lax.dot_general(ih, xj8mT, dn_i,
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(il, xj8mT, dn_i,
                                 preferred_element_type=jnp.float32))
    ai = (out[:, 0:3] + out[:, 3:6]) - xi * (out[:, 6:7] + out[:, 7:8])
    xi8m = _mass_folded_pack(xi, mass_col_i, block_i)
    dn_j = (((0,), (0,)), ((), ()))
    out8 = (jax.lax.dot_general(xi8m, ih, dn_j,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xi8m, il, dn_j,
                                  preferred_element_type=jnp.float32))
    aj = (out8[0:3, :] + out8[3:6, :]) - xjT * (out8[6:7, :]
                                                + out8[7:8, :])
    return ai, aj


def _tile_both(variant, xi, mass_col_i, xjT, mass_row_j, eps2, block_i):
    """One two-sided tile: returns SIGNED (ai (BI, 3), ajT (3, U))
    contributions (add both directly).  Same dispatch + sign conventions
    as the triangular sym kernel bodies (forces_pallas_sym.py:375-412)."""
    if variant in ("turbo2", "mxu", "turbof"):
        dx = xjT[0:1, :] - xi[:, 0:1]
        dy = xjT[1:2, :] - xi[:, 1:2]
        dz = xjT[2:3, :] - xi[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(d2 * d2 * d2)
        if variant == "turbof":
            fb = ((mass_col_i * mass_row_j) * inv).astype(jnp.bfloat16)
            return _accum_both_turbof_T(fb, xi, xjT, block_i)
        if variant == "turbo2":
            ib = inv.astype(jnp.bfloat16)
            return (_accum_i_turbo2_T(ib, xi, xjT, mass_row_j),
                    _accum_j_turbo2(ib, xi, mass_col_i, xjT, block_i))
        return _accum_both_mxu_T(inv, xi, xjT, mass_col_i, mass_row_j,
                                 block_i)
    if variant == "vpu2":
        ai, aj = _pair_products_sym(xi, xjT, mass_row_j, mass_col_i, eps2)
        return ai, -aj
    dx, dy, dz, fi, fj = _pair_terms(xi, xjT, mass_row_j, mass_col_i, eps2)
    if variant == "vpu":
        return (_accum_i_vpu(dx, dy, dz, fi),
                -_accum_j_vpu(dx, dy, dz, fj))
    # turbo
    return (_accum_i_turbo_T(fi, xi, xjT),
            _accum_j_turbo(fj, xi, xjT, block_i))


def _tile_i(variant, xi, mass_col_i, xjT, mass_row_j, eps2, mask=None):
    """One one-sided tile (self sweep / antipodal phase / one-sided
    family): returns the (BI, 3) i-side contribution only, in the SAME
    raw-sum scale as ``_tile_both`` for the variant (mass-scaled
    variants stay mass-scaled so one final 1/m post-scale covers every
    phase's partial sums).

    ``mask``: optional (BI, U) 0/1 self-pair mask, REQUIRED on the self
    phase for the bf16-weight tiers: their accumulate-matmul form
    ``sum(f*xj) - xi*sum(f)`` cancels the r=0 self term by SUBTRACTING
    two huge bf16-rounded products (m~1e9 times inv(eps2)~1e4), which
    explodes at 8-bit mantissa; the exact tiers cancel dx=0 exactly in
    f32 and run unmasked — precisely the classic kernels' self_tile
    split (ops/forces_pallas.py)."""
    if variant in ("turbo2", "mxu", "turbof"):
        dx = xjT[0:1, :] - xi[:, 0:1]
        dy = xjT[1:2, :] - xi[:, 1:2]
        dz = xjT[2:3, :] - xi[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz + eps2
        inv = jax.lax.rsqrt(d2 * d2 * d2)
        if mask is not None:
            inv = inv * mask
        if variant == "turbof":
            fb = ((mass_col_i * mass_row_j) * inv).astype(jnp.bfloat16)
            xj8T = _pack8T(xjT)
            out = jax.lax.dot_general(
                fb, xj8T, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (out[:, 0:3] + out[:, 3:6]) - xi * out[:, 6:7]
        if variant == "turbo2":
            return _accum_i_turbo2_T(inv.astype(jnp.bfloat16), xi, xjT,
                                     mass_row_j)
        ih, il = _bf16_split(inv)
        xj8mT = _mass_folded_packT(xjT, mass_row_j)
        dn = (((1,), (1,)), ((), ()))
        out = (jax.lax.dot_general(ih, xj8mT, dn,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(il, xj8mT, dn,
                                     preferred_element_type=jnp.float32))
        return (out[:, 0:3] + out[:, 3:6]) - xi * (out[:, 6:7]
                                                   + out[:, 7:8])
    if variant == "vpu2":
        dx = xjT[0:1, :] - xi[:, 0:1]
        dy = xjT[1:2, :] - xi[:, 1:2]
        dz = xjT[2:3, :] - xi[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz + eps2
        f = (mass_col_i * mass_row_j) * jax.lax.rsqrt(d2 * d2 * d2)
        return jnp.concatenate(
            [jnp.sum(f * d, axis=1, keepdims=True) for d in (dx, dy, dz)],
            axis=1)
    dx, dy, dz, fi, fj = _pair_terms(xi, xjT, mass_row_j, mass_col_i, eps2)
    del fj
    if variant == "turbo":
        if mask is not None:
            fi = fi * mask
        return _accum_i_turbo_T(fi, xi, xjT)
    return _accum_i_vpu(dx, dy, dz, fi)                    # vpu


@functools.lru_cache(maxsize=None)
def _make_ring_kernel(p: int, c: int, block_i: int, block_u: int,
                      eps2: float, axis: str, variant: str,
                      one_sided: bool, barrier: bool):
    """Build the fused P-phase ring kernel (lru_cache: one trace per
    geometry, like the sym kernel factories)."""
    n_ib = c // block_i
    n_jt = c // block_u
    half = (p - 1) // 2
    if one_sided:
        d_final = p - 1
        two_sided_phases = 0
    else:
        d_final = half if p % 2 else p // 2
        two_sided_phases = half

    def kernel(pos_ref, posT_ref, mass_row_ref, mass_col_ref,
               acc_ref, trav_ref,
               comm_ref, xi_buf, mcol_buf, jt_buf, acc_buf, tacc_buf,
               ack_buf, copy_sem, send_sem, recv_sem, ack_send_sem,
               ack_recv_sem, ret_send_sem, ret_recv_sem):
        my_id = jax.lax.axis_index(axis)
        right = jax.lax.rem(my_id + 1, p)
        left = jax.lax.rem(my_id + p - 1, p)

        if barrier:
            # Real-TPU collective lowering requires the custom global
            # barrier that goes with collective_id: sync both neighbors
            # before any RDMA so no device's send can land in a buffer
            # the receiver has not yet entered the kernel to own.
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                bar, 1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(
                bar, 1, device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bar, 2)

        def cp(src, dst):
            d = pltpu.make_async_copy(src, dst, copy_sem)
            d.start()
            d.wait()

        masked_self = variant in ("turbo", "turbof", "turbo2", "mxu")

        def stream_phase(slot, two_sided, first, self_phase=False):
            """Local i-shard vs payload slot ``slot``: RMW ``acc_ref``
            (plain store when ``first``); ``two_sided`` also folds the
            j-side into the slot's travel rows (4:7).  ``self_phase``
            masks self-pairs for the bf16-weight tiers (see _tile_i)."""

            def ib_body(ib, _):
                row = pl.ds(ib * block_i, block_i)
                cp(pos_ref.at[row, :], xi_buf)
                cp(mass_col_ref.at[row, :], mcol_buf)
                xi = xi_buf[...]
                mci = mcol_buf[...]

                def jt_body(jt, tile):
                    lane = pl.ds(jt * block_u, block_u)
                    cp(comm_ref.at[slot].at[:, lane], jt_buf)
                    xjT = jt_buf[0:3, :]
                    mrj = jt_buf[3:4, :]
                    mask = None
                    if self_phase and masked_self:
                        i_ids = (ib * block_i + jax.lax.broadcasted_iota(
                            jnp.int32, (block_i, block_u), 0))
                        j_ids = (jt * block_u + jax.lax.broadcasted_iota(
                            jnp.int32, (block_i, block_u), 1))
                        mask = (i_ids != j_ids).astype(jnp.float32)
                    if two_sided:
                        ai, ajT = _tile_both(variant, xi, mci, xjT, mrj,
                                             eps2, block_i)
                        tacc_buf[0:3, :] = jt_buf[4:7, :] + ajT
                        tacc_buf[3:4, :] = jt_buf[7:8, :]
                        cp(tacc_buf,
                           comm_ref.at[slot].at[pl.ds(4, 4), lane])
                    else:
                        ai = _tile_i(variant, xi, mci, xjT, mrj, eps2,
                                     mask=mask)
                    return tile + ai

                tile = jax.lax.fori_loop(
                    0, n_jt, jt_body, jnp.zeros((block_i, 3), jnp.float32))
                if first:
                    acc_buf[...] = tile
                else:
                    cp(acc_ref.at[row, :], acc_buf)
                    acc_buf[...] = acc_buf[...] + tile
                cp(acc_buf, acc_ref.at[row, :])
                return 0

            jax.lax.fori_loop(0, n_ib, ib_body, 0)

        # ---- pack phase-0 payload: rows 0:3 posT, 3 mass, 4:8 zeros.
        cp(posT_ref, comm_ref.at[0].at[pl.ds(0, 3), :])
        cp(mass_row_ref, comm_ref.at[0].at[pl.ds(3, 1), :])
        tacc_buf[...] = jnp.zeros_like(tacc_buf)
        for jt in range(n_jt):
            cp(tacc_buf,
               comm_ref.at[0].at[pl.ds(4, 4), pl.ds(jt * block_u, block_u)])

        # ---- self phase.
        stream_phase(0, two_sided=False, first=True, self_phase=True)

        if p == 1:
            cp(comm_ref.at[0].at[pl.ds(4, 4), :], trav_ref)
            return

        def send_payload(d):
            """Forward slot (d-1)%2 to the right neighbor's slot d%2."""
            return pltpu.make_async_remote_copy(
                src_ref=comm_ref.at[jax.lax.rem(d - 1, 2)],
                dst_ref=comm_ref.at[jax.lax.rem(d, 2)],
                send_sem=send_sem, recv_sem=recv_sem,
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

        def _ack_dma():
            return pltpu.make_async_remote_copy(
                src_ref=ack_buf, dst_ref=ack_buf,
                send_sem=ack_send_sem, recv_sem=ack_recv_sem,
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

        def send_ack():
            """Tiny RDMA to the left: "the slot your next send targets is
            free" (remote semaphore_signal is unavailable in interpret
            mode, so the ack is a real 128-lane copy)."""
            a = _ack_dma()
            a.start()
            a.wait_send()

        def ack_consume():
            # DMA semaphores are waited through a descriptor of the same
            # shape: this retires ONE incoming ack (all acks are
            # identical 128-lane copies).
            _ack_dma().wait_recv()

        # Prophylactic ack: every remote slot 1 starts free, so phase 1's
        # gate is pre-satisfied; thereafter each phase emits exactly one
        # ack after its forward completes and the drain below retires the
        # final one — produced = consumed = d_final + 1 on every device,
        # so all semaphores return to zero across kernel invocations.
        send_ack()

        def phase(d, two_sided):
            ack_consume()
            dma = send_payload(d)
            dma.start()
            dma.wait()          # send done AND phase-d payload received
            send_ack()
            stream_phase(jax.lax.rem(d, 2), two_sided=two_sided,
                         first=False)
            return 0

        if two_sided_phases > 0:
            jax.lax.fori_loop(
                1, two_sided_phases + 1,
                lambda d, _: phase(d, True), 0)
        if one_sided:
            if d_final > 0:
                jax.lax.fori_loop(
                    1, d_final + 1, lambda d, _: phase(d, False), 0)
        elif p % 2 == 0:
            # Antipodal phase (even P): self-mirrored, one-sided.
            phase(d_final, False)
        ack_consume()           # drain the final ack

        # ---- return hop: travel rows go straight home (distance
        # d_final; ICI routes non-neighbor logical ids).  One-sided mode
        # and P=2 return zeros (travel never updated) — keeps the
        # semaphore/output contract uniform.
        home = jax.lax.rem(my_id + p - d_final, p)
        ret = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[jax.lax.rem(d_final, 2)].at[pl.ds(4, 4), :],
            dst_ref=trav_ref,
            send_sem=ret_send_sem, recv_sem=ret_recv_sem,
            device_id=home,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        ret.start()
        ret.wait()

    return kernel


def rdma_forces_local(pos_l, mass_l, cfg: SimConfig, impl: str,
                      axis: str = SHARD_AXIS):
    """Per-shard ring force sweep with in-kernel RDMA (call inside
    shard_map).  Accepts the full sym ladder (N3L half-ring with a
    traveling accumulator) and the one-sided exact/turbo family (full
    ring, data-only payloads) at arbitrary shard sizes (HBM-resident,
    tiles streamed to VMEM)."""
    from .ring import _SYM_VARIANTS
    p = jax.lax.axis_size(axis)
    c = pos_l.shape[0]
    sym_variant = _SYM_VARIANTS.get(impl)
    if sym_variant is not None:
        variant, one_sided = sym_variant, False
    elif impl in _RDMA_ONE_SIDED:
        variant, one_sided = _RDMA_ONE_SIDED[impl], True
    else:
        raise ValueError(
            f"comm='rdma' supports the pallas_sym* ladder and the "
            f"one-sided {sorted(_RDMA_ONE_SIDED)} family, got {impl!r}")
    # run_steps_sharded pads shards to max(block_i, block_j, 8) — NOT to
    # block_u (e.g. the exact tier's autotuned 1536) — so clamp each block
    # to its gcd with the shard size rather than rejecting valid configs.
    block_i = math.gcd(min(cfg.block_i, c), c)
    block_u = math.gcd(min(cfg.block_u or cfg.block_j, c), c)
    interpret = jax.default_backend() != "tpu"
    use_barrier = (not interpret) and p > 1
    kernel = _make_ring_kernel(p, c, block_i, block_u, float(cfg.eps2),
                               axis, variant, one_sided, use_barrier)
    posT = pos_l.T
    mass_row = mass_l[None, :]
    mass_col = mass_l[:, None]
    acc_own, trav = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((c, 3), jnp.float32),
                   jax.ShapeDtypeStruct((4, c), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pl.ANY((2, 8, c), jnp.float32),          # payload double buffer
            pltpu.VMEM((block_i, 3), jnp.float32),   # xi stage
            pltpu.VMEM((block_i, 1), jnp.float32),   # mass_col stage
            pltpu.VMEM((8, block_u), jnp.float32),   # payload tile stage
            pltpu.VMEM((block_i, 3), jnp.float32),   # acc RMW stage
            pltpu.VMEM((4, block_u), jnp.float32),   # travel RMW stage
            pltpu.VMEM((1, 128), jnp.float32),       # ack token
            pltpu.SemaphoreType.DMA,                 # local copies
            pltpu.SemaphoreType.DMA,                 # data send
            pltpu.SemaphoreType.DMA,                 # data recv
            pltpu.SemaphoreType.DMA,                 # ack send
            pltpu.SemaphoreType.DMA,                 # ack recv
            pltpu.SemaphoreType.DMA,                 # return send
            pltpu.SemaphoreType.DMA,                 # return recv
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            collective_id=0) if use_barrier else None,
    )(pos_l, posT, mass_row, mass_col)
    return _inv_mass_scale(acc_own + trav[0:3, :].T, mass_l, variant)
