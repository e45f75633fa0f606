"""In-kernel RDMA ring force sweep — compute/communication overlap inside
ONE Pallas kernel per chip.

The XLA ring (``ring.py::ring_forces_local``) alternates ``ppermute`` and
kernel launches at the JAX level; XLA's async collective scheduling can
overlap hops with compute, but every hop is still a separate program-level
collective with its own launch/fusion boundary.  This module is the
ROADMAP's stated next step for multi-chip: the entire P-phase ring sweep
lives inside a single ``pallas_call`` per device, moving the visiting
j-shard between neighbors with explicit inter-chip DMAs
(``pltpu.make_async_remote_copy``) that run WHILE the VPU computes force
tiles against the currently-held shard — the TPU analog of what the
reference's CUDA stream overlap would be for multi-GPU (the reference
itself is single-GPU: ``kernel.cu:96-114`` streams tiles through shared
memory; here shards stream around the ICI ring through VMEM).

Protocol (per device, P = ring size, C = shard size):

- ``comm_buf`` is a double-buffered VMEM scratch of shape ``(2, 4, C)``
  holding ``[x; y; z; mass]`` rows of the VISITING shard.  Slot ``s % 2``
  holds phase ``s``'s data.  The packed 4-row layout is built IN-KERNEL
  from the plain ``posT``/``mass_row`` operand streams (the platform
  operand-ingestion bug, docs/PERF.md, forbids XLA-premade packed
  operands; in-kernel derivation is the documented safe pattern).
- Phase ``s``: start the RDMA of slot ``s % 2`` to the right neighbor's
  slot ``(s+1) % 2``, then compute the local i-shard against slot
  ``s % 2`` (send and compute read the same buffer concurrently — both
  are reads), then wait send + recv.
- Buffer-reuse safety ("consumed" ack): my send #s overwrites the right
  neighbor's slot ``(s+1) % 2``, which that neighbor last read during its
  phase ``s-1``.  Each device therefore sends a zero-byte-equivalent ack
  RDMA to its LEFT neighbor when entering phase ``s`` (meaning "phase
  ``s-1`` is fully consumed; the slot your send #s targets is free") and
  waits for the matching ack from its RIGHT neighbor before starting send
  #s (s >= 1).  The ack is itself a tiny RDMA because the interpret-mode
  runtime (our only multi-device test vehicle on 1-chip hardware) does
  not implement remote ``semaphore_signal``.
- Summation order: phase order visits shards ``me, me-1, me-2, ...``
  (data flows rightward), so per-body sums group by source shard exactly
  like the ppermute ring — same exact-tier accuracy class
  (oracle-gated in ``tests/test_rdma_ring.py``).

Force law is the universal contract (``kernel.cu:9-29``): one-sided
exact-tier VPU math (d2 = |r|^2 + eps2, f = m_j * rsqrt(d2^3), no i != j
guard — self-pairs vanish via r = 0 under softening on the self-phase).

V1 scope: the local shard and both comm slots are VMEM-resident, which
caps the per-chip shard at roughly 8-12k bodies (the (C, 3) lane padding
3 -> 128 costs 512 B/body on the pos operand and the acc output; the
packed comm slots cost 32 B/body each).  ``_validate_vmem`` enforces the
budget on real TPUs.  Lifting the cap needs HBM-staged i-block local
DMAs inside the phase loop — noted in ROADMAP; pointless to build before
multi-chip hardware exists to measure it.

Cannot be performance-measured on this relay (1 real chip); correctness
is gated on the 8/5/3/2/1-device interpret-mode CPU meshes, the driver's
``dryrun_multichip`` exercises it end-to-end, and the P=1 branch is
compile-spot-checked on the real chip (CLAUDE.md device-code rule;
driven round 4: mesh(1) x 5 steps at N=4096, oracle mismatch 0.0).
The P>1 Mosaic lowering additionally requires the collective barrier
prologue (collective_id + get_barrier_semaphore) — the real-chip compile
check is what surfaced that; interpret mode accepts kernels real Mosaic
rejects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from .mesh import SHARD_AXIS

# VMEM budget for the resident working set (same constant family as
# forces_pallas_sym._VMEM_BUDGET_BYTES).
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _vmem_bytes(c: int) -> int:
    """Resident bytes for shard size C: pos (C,3) lane-padded to (C,128),
    acc likewise, posT (3,C) + mass (1,C) sublane-padded to 8 rows, and
    two (4,C) comm slots sublane-padded to 8 rows."""
    pad128 = 128 * 4
    return c * pad128 * 2 + 8 * c * 4 * 2 + 2 * 8 * c * 4


def _tile_acc(xi, xjT, mrow, eps2):
    """One (BI, BU) exact force tile: returns the (BI, 3) contribution.
    Identical math to forces_pallas_sym._pair_terms + _accum_i_vpu."""
    dx = xjT[0:1, :] - xi[:, 0:1]
    dy = xjT[1:2, :] - xi[:, 1:2]
    dz = xjT[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    fi = mrow * jax.lax.rsqrt(d2 * d2 * d2)
    ax = jnp.sum(fi * dx, axis=1, keepdims=True)
    ay = jnp.sum(fi * dy, axis=1, keepdims=True)
    az = jnp.sum(fi * dz, axis=1, keepdims=True)
    return jnp.concatenate([ax, ay, az], axis=1)


@functools.lru_cache(maxsize=None)
def _make_rdma_kernel(p: int, c: int, block_i: int, block_u: int,
                      eps2: float, axis: str, barrier: bool):
    """Build the P-phase ring kernel body (lru_cache: one trace per
    geometry, like the sym kernel factories)."""
    n_ib = c // block_i
    n_jt = c // block_u

    def compute_phase(pos_ref, comm_ref, acc_ref, slot):
        """Accumulate forces of the local i-shard vs comm slot ``slot``."""

        def ib_body(ib, _):
            xi = pos_ref[pl.ds(ib * block_i, block_i), :]

            def jt_body(jt, tile):
                blk = comm_ref[pl.ds(slot, 1), :,
                               pl.ds(jt * block_u, block_u)]
                return tile + _tile_acc(xi, blk[0, 0:3, :], blk[0, 3:4, :],
                                        eps2)

            tile = jax.lax.fori_loop(
                0, n_jt, jt_body,
                jnp.zeros((block_i, 3), jnp.float32))
            isl = (pl.ds(ib * block_i, block_i), slice(None))
            acc_ref[isl] = acc_ref[isl] + tile
            return 0

        jax.lax.fori_loop(0, n_ib, ib_body, 0)

    def kernel(pos_ref, posT_ref, mass_row_ref, acc_ref, comm_ref, ack_ref,
               send_sem, recv_sem, ack_send_sem, ack_recv_sem):
        my_id = jax.lax.axis_index(axis)
        right = jax.lax.rem(my_id + 1, p)
        left = jax.lax.rem(my_id + p - 1, p)

        if barrier:
            # Real-TPU collective lowering requires the custom global
            # barrier that goes with collective_id: sync both neighbors
            # before any RDMA so no device's send can land in a buffer
            # the receiver has not yet entered the kernel to own.
            # (Interpret mode has no remote semaphore_signal; its
            # discharge semantics make the barrier unnecessary there.)
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                bar, 1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(
                bar, 1, device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bar, 2)

        acc_ref[...] = jnp.zeros_like(acc_ref)
        # Phase 0's visiting shard is our own: pack [posT; mass] in-kernel.
        comm_ref[0, 0:3, :] = posT_ref[...]
        comm_ref[0, 3:4, :] = mass_row_ref[...]

        if p == 1:
            compute_phase(pos_ref, comm_ref, acc_ref, 0)
            return

        def send_data(s):
            """RDMA comm slot s%2 -> right neighbor's slot (s+1)%2."""
            return pltpu.make_async_remote_copy(
                src_ref=comm_ref.at[jax.lax.rem(s, 2)],
                dst_ref=comm_ref.at[jax.lax.rem(s + 1, 2)],
                send_sem=send_sem, recv_sem=recv_sem,
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

        def send_ack():
            """Tiny RDMA to the left: "your next send's target slot is
            free" (remote semaphore_signal is unavailable in interpret
            mode, so the ack is a real 128-lane copy)."""
            return pltpu.make_async_remote_copy(
                src_ref=ack_ref, dst_ref=ack_ref,
                send_sem=ack_send_sem, recv_sem=ack_recv_sem,
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

        # Phase 0 (own shard): no ack gate — both remote slots start free.
        dma0 = send_data(0)
        dma0.start()
        compute_phase(pos_ref, comm_ref, acc_ref, 0)
        dma0.wait()

        def phase_body(s, _):
            # Entering phase s (1 <= s <= P-2): slot s%2 holds recv #s-1.
            # 1. Tell the left neighbor phase s-1 is consumed.
            ack = send_ack()
            ack.start()
            # 2. Gate send #s on the right neighbor's matching ack
            #    (wait_recv on the shared ack_recv_sem).
            ack.wait_recv()
            dma = send_data(s)
            dma.start()
            # 3. Compute against slot s%2 while both DMAs fly.
            compute_phase(pos_ref, comm_ref, acc_ref, jax.lax.rem(s, 2))
            dma.wait()
            ack.wait_send()
            return 0

        if p > 2:
            jax.lax.fori_loop(1, p - 1, phase_body, 0)

        # Final phase P-1: no further send; just drain the ack channel and
        # compute the last visiting shard.
        ack = send_ack()
        ack.start()
        compute_phase(pos_ref, comm_ref, acc_ref, jax.lax.rem(p - 1, 2))
        ack.wait_send()
        ack.wait_recv()

    return kernel


def rdma_forces_local(pos_l, mass_l, cfg: SimConfig, impl: str,
                      axis: str = SHARD_AXIS):
    """Per-shard ring force sweep with in-kernel RDMA (call inside
    shard_map).  Exact one-sided tier regardless of ``impl`` (v1 — the
    variant ladder rides the ppermute rings; this path demonstrates and
    tests the fused-comm design until multi-chip hardware exists)."""
    del impl  # exact tier only in v1
    import math
    p = jax.lax.axis_size(axis)
    c = pos_l.shape[0]
    # run_steps_sharded pads shards to max(block_i, block_j, 8) — NOT to
    # block_u (e.g. the exact tier's autotuned 1536) — so clamp each block
    # to its gcd with the shard size rather than rejecting valid configs.
    block_i = math.gcd(min(cfg.block_i, c), c)
    block_u = math.gcd(min(cfg.block_u or cfg.block_j, c), c)
    interpret = jax.default_backend() != "tpu"
    if not interpret and _vmem_bytes(c) > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"rdma ring v1 keeps the whole shard VMEM-resident: C={c} needs "
            f"~{_vmem_bytes(c) / 2 ** 20:.1f} MB > "
            f"{_VMEM_BUDGET_BYTES / 2 ** 20:.0f} MB budget; use "
            f"comm='ring' for larger shards")

    # The custom collective barrier (and the collective_id that names it)
    # only exist in the real Mosaic lowering, and only matter when remote
    # DMAs happen at all (P > 1): Mosaic rejects collective_id without a
    # barrier, and interpret mode lacks remote semaphore_signal.
    use_barrier = (not interpret) and p > 1
    kernel = _make_rdma_kernel(p, c, block_i, block_u, float(cfg.eps2),
                               axis, use_barrier)
    posT = pos_l.T
    mass_row = mass_l[None, :]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, 3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, c), jnp.float32),      # comm double buffer
            pltpu.VMEM((1, 128), jnp.float32),       # ack token
            pltpu.SemaphoreType.DMA,                 # data send
            pltpu.SemaphoreType.DMA,                 # data recv
            pltpu.SemaphoreType.DMA,                 # ack send
            pltpu.SemaphoreType.DMA,                 # ack recv
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            collective_id=0) if use_barrier else None,
    )(pos_l, posT, mass_row)
