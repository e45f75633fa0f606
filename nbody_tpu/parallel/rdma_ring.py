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
COMPILED AND RAN oracle-exact on the real chip (round 4; mismatch frac 0
at the 1% gate for vpu / vpu2 / turbo).  That spot-check is what shaped
the buffer design — interpret mode accepts four spellings real Mosaic
rejects: ANY/HBM-space *scratch* (workspace outputs instead), sub-tile
SUBLANE memref slices in HBM or VMEM (row splits on loaded values only),
narrow-lane VMEM scratch like (BI, 3) / (U, 3) (everything lives wide
and transposed in-kernel), and sub-8-row HBM DMA targets (the own
payload arrives pre-packed as wide plain f32 rows).  The P>1 lowering
(collective barrier prologue + cross-chip DMA) remains hardware-gated:
the relay's AOT compiler is single-chip.
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
                      one_sided: bool, barrier: bool,
                      overlap: bool = False):
    """Build the fused P-phase ring kernel (lru_cache: one trace per
    geometry, like the sym kernel factories).

    ``overlap=True`` selects the comm/compute-overlap protocol
    (round-5, VERDICT r4 #7 — the ROADMAP-deferred design, built now so
    the day multi-chip hardware appears the measurement is a script run):

    - **data rows forward ON RECEIPT**: the moment phase d's payload
      lands, its immutable data rows (posT + mass) start the RDMA to the
      right neighbor — the phase-(d+1) hop rides the ICI *under* phase
      d's compute instead of serializing before it (and the very first
      hop rides under the SELF sweep).
    - **travel rows trail one phase**: the j-side (N3L) partials cannot
      forward until the host chip has added its contribution, so each
      phase accumulates its ajT tiles into a private ``jacc`` workspace
      during compute, waits for the (late) travel payload, folds
      ``jacc`` in, and only then forwards the travel rows — they chase
      the data wavefront exactly one compute phase behind.
    - **flow control is unchanged in shape** (one ack per phase + one
      prophylactic, drain at the end) but the ack ordering now carries
      the proof burden: the k-th ack a chip emits is sent only after its
      F_k payload sends completed, and a neighbor must consume k acks
      before launching its (k+1)-th forward — so an incoming phase-(d+1)
      payload can never overwrite the slot a still-in-flight F_d send is
      reading (the two in-flight data DMAs per chip ride parity-split
      semaphore pairs).
    - Phases unroll as a PYTHON loop (d_final is static) so every slot
      and semaphore index is static — no dynamic semaphore addressing
      for Mosaic to reject.

    Like the base protocol, P>1 lowering remains hardware-gated
    (interpret-oracle-gated on CPU meshes; the relay compiles P=1 only,
    where overlap degenerates to the self sweep)."""
    n_ib = c // block_i
    n_jt = c // block_u
    half = (p - 1) // 2
    if one_sided:
        d_final = p - 1
        two_sided_phases = 0
    else:
        d_final = half if p % 2 else p // 2
        two_sided_phases = half

    def kernel(own_ref,
               accT_ref, trav_ref, data_ref, ctrav_ref, jacc_ref,
               xi8_buf, jt_buf, at4_buf, tacc_buf, jacc_buf,
               ack_buf, copy_sem, send_sems, recv_sems,
               ack_send_sem, ack_recv_sem, ret_send_sem, ret_recv_sem):
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

        def stream_phase(slot, two_sided, first, self_phase=False,
                         to_jacc=False):
            """Local i-shard vs payload slot ``slot``: RMW ``accT_ref``
            (plain store when ``first``); ``two_sided`` also folds the
            j-side into the slot's travel rows — or, under the overlap
            protocol (``to_jacc``), into the private ``jacc`` workspace,
            because the travel payload has not arrived yet while this
            phase computes.  ``self_phase`` masks self-pairs for the
            bf16-weight tiers (see _tile_i).

            Mosaic's tiled memrefs (HBM and VMEM alike) reject sub-tile
            SUBLANE slices and narrow-lane buffers — every buffer here
            is therefore wide and tile-aligned ((8, U) payload tiles,
            (4, U) travel tiles, (8, BI) / (4, BI) i-side tiles), rows
            are split on LOADED VALUES only, and the i-shard / the
            accumulator live TRANSPOSED (xi staged from the chip's own
            (8, C) payload by lane slicing; narrow value transposes
            compile and are exact — probed on the real chip)."""

            def ib_body(ib, _):
                ilane = pl.ds(ib * block_i, block_i)
                cp(own_ref.at[:, ilane], xi8_buf)
                v8 = xi8_buf[...]                       # (8, BI)
                xi = v8[0:3, :].T                       # (BI, 3)
                mci = v8[3:4, :].T                      # (BI, 1)

                def jt_body(jt, tile):
                    lane = pl.ds(jt * block_u, block_u)
                    cp(data_ref.at[slot].at[:, lane], jt_buf)
                    tile8 = jt_buf[...]
                    xjT = tile8[0:3, :]
                    mrj = tile8[3:4, :]
                    mask = None
                    if self_phase and masked_self:
                        i_ids = (ib * block_i + jax.lax.broadcasted_iota(
                            jnp.int32, (block_i, block_u), 0))
                        j_ids = (jt * block_u + jax.lax.broadcasted_iota(
                            jnp.int32, (block_i, block_u), 1))
                        mask = (i_ids != j_ids).astype(jnp.float32)
                    if two_sided:
                        jref = (jacc_ref.at[:, lane] if to_jacc
                                else ctrav_ref.at[slot].at[:, lane])
                        cp(jref, tacc_buf)
                        ai, ajT = _tile_both(variant, xi, mci, xjT, mrj,
                                             eps2, block_i)
                        t4 = tacc_buf[...]
                        tacc_buf[...] = jnp.concatenate(
                            [t4[0:3, :] + ajT, t4[3:4, :]], axis=0)
                        cp(tacc_buf, jref)
                    else:
                        ai = _tile_i(variant, xi, mci, xjT, mrj, eps2,
                                     mask=mask)
                    return tile + ai

                tile = jax.lax.fori_loop(
                    0, n_jt, jt_body, jnp.zeros((block_i, 3), jnp.float32))
                tileT = jnp.concatenate(
                    [tile.T, jnp.zeros((1, block_i), jnp.float32)], axis=0)
                if first:
                    at4_buf[...] = tileT
                else:
                    cp(accT_ref.at[:, ilane], at4_buf)
                    at4_buf[...] = at4_buf[...] + tileT
                cp(at4_buf, accT_ref.at[:, ilane])
                return 0

            jax.lax.fori_loop(0, n_ib, ib_body, 0)

        # ---- phase-0 payload: the chip's own (8, C) [posT; mass; pad]
        # payload arrives PRE-PACKED as an input (XLA builds it per shard
        # — wide plain f32 rows, outside the narrow-bf16/SMEM mechanism
        # of the operand-ingestion platform bug, and oracle-verified by
        # the compiled spot-check); one aligned HBM->HBM DMA seeds slot 0
        # and the travel accumulator zeroes tile-by-tile.
        cp(own_ref, data_ref.at[0])
        tacc_buf[...] = jnp.zeros_like(tacc_buf)
        for jt in range(n_jt):
            cp(tacc_buf,
               ctrav_ref.at[0].at[:, pl.ds(jt * block_u, block_u)])

        def send_payload(d):
            """Forward slot (d-1)%2 to the right neighbor's slot d%2 —
            two concurrent RDMAs (data / travel), each on its own
            (ref, target-parity) semaphore pair so waits match
            descriptors even when the overlap protocol keeps two data
            DMAs in flight."""
            s, t = jax.lax.rem(d - 1, 2), jax.lax.rem(d, 2)
            return [
                pltpu.make_async_remote_copy(
                    src_ref=ref.at[s], dst_ref=ref.at[t],
                    send_sem=send_sems.at[k, t], recv_sem=recv_sems.at[k, t],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                for k, ref in enumerate((data_ref, ctrav_ref))]

        def _payload_dma(k, ref, d):
            # Static-index twin of send_payload for the overlap path
            # (phases unroll in Python, so slot/semaphore indices are
            # compile-time constants).
            s, t = (d - 1) % 2, d % 2
            return pltpu.make_async_remote_copy(
                src_ref=ref.at[s], dst_ref=ref.at[t],
                send_sem=send_sems.at[k, t], recv_sem=recv_sems.at[k, t],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

        def data_dma(d):
            return _payload_dma(0, data_ref, d)

        def trav_dma(d):
            return _payload_dma(1, ctrav_ref, d)

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

        if overlap and p > 1:
            # ---- OVERLAP protocol (see factory docstring).  Ack
            # accounting: produced = prophylactic + one per phase
            # = d_final + 1 = consumed (prologue F_1 + one per
            # F_{d+1} start + final drain); the k-th ack is emitted
            # only after the F_k sends completed, and a neighbor
            # consumes k acks before its (k+1)-th forward — the
            # counting itself forbids overwriting a slot an in-flight
            # send still reads.
            send_ack()                       # prophylactic
            ack_consume()
            data_dma(1).start()              # own data rides under the
            trav_dma(1).start()              # self sweep (travel = zeros)
            stream_phase(0, two_sided=False, first=True, self_phase=True)
            for d in range(1, d_final + 1):
                s = d % 2
                data_dma(d).wait_recv()      # phase-d payload landed
                if d < d_final:
                    ack_consume()
                    data_dma(d + 1).start()  # forward ON RECEIPT
                two = (not one_sided) and d <= two_sided_phases
                if two:
                    # Zero the jacc workspace (travel has not arrived;
                    # ajT accumulates privately during compute).
                    jacc_buf[...] = jnp.zeros_like(jacc_buf)
                    for jt in range(n_jt):
                        cp(jacc_buf,
                           jacc_ref.at[:, pl.ds(jt * block_u, block_u)])
                stream_phase(s, two_sided=two, first=False, to_jacc=two)
                trav_dma(d).wait_recv()      # travel trails one phase
                if two:
                    for jt in range(n_jt):
                        lane = pl.ds(jt * block_u, block_u)
                        cp(ctrav_ref.at[s].at[:, lane], tacc_buf)
                        cp(jacc_ref.at[:, lane], jacc_buf)
                        tacc_buf[...] = tacc_buf[...] + jacc_buf[...]
                        cp(tacc_buf, ctrav_ref.at[s].at[:, lane])
                data_dma(d).wait_send()
                trav_dma(d).wait_send()
                if d < d_final:
                    trav_dma(d + 1).start()  # chases the data wavefront
                send_ack()                   # slot (d-1)%2 fully free
            ack_consume()                    # drain the final ack
        else:
            # ---- self phase, then the sequential protocol (v2
            # baseline).
            stream_phase(0, two_sided=False, first=True, self_phase=True)
            if p == 1:
                cp(ctrav_ref.at[0], trav_ref)
                return
            # Prophylactic ack: every remote slot 1 starts free, so
            # phase 1's gate is pre-satisfied; thereafter each phase
            # emits exactly one ack after its forward completes and the
            # drain below retires the final one — produced = consumed =
            # d_final + 1 on every device, so all semaphores return to
            # zero across kernel invocations.
            send_ack()

            def phase(d, two_sided):
                ack_consume()
                dmas = send_payload(d)
                for dma in dmas:
                    dma.start()
                for dma in dmas:
                    dma.wait()  # send done AND phase-d payload received
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
            ack_consume()       # drain the final ack

        # ---- return hop: travel rows go straight home (distance
        # d_final; ICI routes non-neighbor logical ids).  One-sided mode
        # and P=2 return zeros (travel never updated) — keeps the
        # semaphore/output contract uniform.
        home = jax.lax.rem(my_id + p - d_final, p)
        ret = pltpu.make_async_remote_copy(
            src_ref=ctrav_ref.at[jax.lax.rem(d_final, 2)],
            dst_ref=trav_ref,
            send_sem=ret_send_sem, recv_sem=ret_recv_sem,
            device_id=home,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        ret.start()
        ret.wait()

    return kernel


def rdma_forces_local(pos_l, mass_l, cfg: SimConfig, impl: str,
                      axis: str = SHARD_AXIS, overlap: bool = False):
    """Per-shard ring force sweep with in-kernel RDMA (call inside
    shard_map).  Accepts the full sym ladder (N3L half-ring with a
    traveling accumulator) and the one-sided exact/turbo family (full
    ring, data-only payloads) at arbitrary shard sizes (HBM-resident,
    tiles streamed to VMEM).

    ``overlap=True`` (comm='rdma_overlap') selects the comm/compute-
    overlap protocol: data rows forward on receipt, travel rows trail
    one phase (see ``_make_ring_kernel``).  Identical physics; the
    travel partial sums fold in a different (still deterministic)
    association order, so results differ from the sequential ring only
    at rounding scale."""
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
                               axis, variant, one_sided, use_barrier,
                               overlap)
    # The chip's own payload is pre-packed by XLA (wide plain f32 rows:
    # posT, mass, zero pad — NOT the narrow-bf16/SMEM shapes the
    # operand-ingestion platform bug corrupts; the compiled spot-check
    # oracle-gates ingestion), because Mosaic's tiled memrefs reject
    # every in-kernel route to it: sub-tile SUBLANE slices (HBM and
    # VMEM) and narrow-lane VMEM buffers ((U, 3) / (BI, 3) scratch) all
    # fail to lower on real hardware.  For the same reason the rotating
    # payload rides ANY *outputs* (HBM workspaces, discarded) — this
    # relay's AOT compiler rejects ANY-space scratch and crashes on
    # HBM-space scratch — split as (2, 8, C) data + (2, 4, C) travel so
    # every slot/lane slice is tile-aligned, and the accumulator is
    # built TRANSPOSED (4, C) and flipped back by XLA below.
    own = jnp.concatenate(
        [pos_l.T, mass_l[None, :], jnp.zeros((4, c), jnp.float32)], axis=0)
    accT, trav, _, _, _ = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((4, c), jnp.float32),
                   jax.ShapeDtypeStruct((4, c), jnp.float32),
                   jax.ShapeDtypeStruct((2, 8, c), jnp.float32),
                   jax.ShapeDtypeStruct((2, 4, c), jnp.float32),
                   jax.ShapeDtypeStruct((4, c), jnp.float32)),  # jacc ws
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(5)),
        scratch_shapes=[
            pltpu.VMEM((8, block_i), jnp.float32),   # xiT stage
            pltpu.VMEM((8, block_u), jnp.float32),   # payload tile stage
            pltpu.VMEM((4, block_i), jnp.float32),   # accT RMW stage
            pltpu.VMEM((4, block_u), jnp.float32),   # travel RMW stage
            pltpu.VMEM((4, block_u), jnp.float32),   # jacc RMW stage
            pltpu.VMEM((1, 128), jnp.float32),       # ack token
            pltpu.SemaphoreType.DMA,                 # local copies
            pltpu.SemaphoreType.DMA((2, 2)),         # sends (ref, parity)
            pltpu.SemaphoreType.DMA((2, 2)),         # recvs (ref, parity)
            pltpu.SemaphoreType.DMA,                 # ack send
            pltpu.SemaphoreType.DMA,                 # ack recv
            pltpu.SemaphoreType.DMA,                 # return send
            pltpu.SemaphoreType.DMA,                 # return recv
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            collective_id=0) if use_barrier else None,
    )(own)
    acc_own = accT[0:3, :].T
    return _inv_mass_scale(acc_own + trav[0:3, :].T, mass_l, variant)
