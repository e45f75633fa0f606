"""Round-8 probe: Mosaic lowering rules for manual-DMA Pallas kernels.

Minimal kernels compiled ON THE REAL CHIP (default backend; do not force
CPU) that bisect the four lowering constraints documented in
docs/PERF.md "Mosaic lowering rules for manual-DMA kernels":

  1. ANY/HBM-space scratch is rejected / crashes the AOT compiler;
     ANY *outputs* work as HBM DMA workspaces.
  2. Sub-tile SUBLANE memref slices fail (HBM and VMEM); row splits on
     loaded values lower fine.
  3. Narrow-lane VMEM scratch ((8, 3) etc.) fails; wide buffers with
     narrow value transposes are exact.
  4. make_async_remote_copy with device_id=self compiles and runs at
     P=1 (no barrier needed single-chip).

Each probe prints OK/FAIL; the EXPECTED pattern on the v5e relay stack
(August 2026) is recorded inline.  Re-run on libtpu/Mosaic upgrades —
if the FAILs turn OK, the RDMA kernel's workarounds can be simplified
(parallel/rdma_ring.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(label, expect, kernel, scratch, x, out_shape):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch + [pltpu.SemaphoreType.DMA],
        )(x)
        np.asarray(out)
        print(f"{label}: OK (expected {expect})")
    except Exception as e:
        print(f"{label}: FAIL (expected {expect}) — "
              f"{str(e)[:90].replace(chr(10), ' ')}")


def main():
    print("backend:", jax.default_backend())
    x8 = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    # 1a. ANY scratch (expected FAIL: cannot infer memory space)
    def k_any(x_ref, o_ref, buf, sem):
        cp = pltpu.make_async_copy(x_ref, buf.at[0], sem)
        cp.start(); cp.wait()
        cp2 = pltpu.make_async_copy(buf.at[0], o_ref, sem)
        cp2.start(); cp2.wait()
    run("1a ANY scratch", "FAIL", k_any,
        [pl.ANY((2, 8, 128), jnp.float32)], x8, (8, 128))

    # 1b. HBM scratch (expected FAIL: compile-helper crash)
    run("1b HBM scratch", "FAIL", k_any,
        [pltpu.MemorySpace.HBM((2, 8, 128), jnp.float32)], x8, (8, 128))

    # 1c. ANY workspace OUTPUT as DMA target (expected OK)
    def k_ws(x_ref, o_ref, vbuf, sem):
        cp = pltpu.make_async_copy(x_ref, vbuf, sem)
        cp.start(); cp.wait()
        cp2 = pltpu.make_async_copy(vbuf, o_ref, sem)
        cp2.start(); cp2.wait()
    run("1c VMEM scratch + ANY in/out", "OK", k_ws,
        [pltpu.VMEM((8, 128), jnp.float32)], x8, (8, 128))

    # 2a. sublane REF slice of VMEM (expected FAIL)
    def k_refslice(x_ref, o_ref, b, sem):
        cp = pltpu.make_async_copy(x_ref, b, sem)
        cp.start(); cp.wait()
        cp2 = pltpu.make_async_copy(b.at[pl.ds(0, 3), :],
                                    o_ref.at[pl.ds(0, 3), :], sem)
        cp2.start(); cp2.wait()
    run("2a sublane ref slice", "FAIL", k_refslice,
        [pltpu.VMEM((8, 128), jnp.float32)], x8, (8, 128))

    # 2b. row split on loaded VALUE (expected OK)
    def k_valslice(x_ref, o_ref, b, sem):
        cp = pltpu.make_async_copy(x_ref, b, sem)
        cp.start(); cp.wait()
        v = b[...]
        b[...] = jnp.concatenate(
            [v[0:3, :] * 2.0, v[3:8, :]], axis=0)
        cp2 = pltpu.make_async_copy(b, o_ref, sem)
        cp2.start(); cp2.wait()
    run("2b value row split", "OK", k_valslice,
        [pltpu.VMEM((8, 128), jnp.float32)], x8, (8, 128))

    # 3a. narrow-lane scratch (expected FAIL)
    def k_narrow(x_ref, o_ref, nb, wb, sem):
        cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(0, 3)], nb, sem)
        cp.start(); cp.wait()
        wb[...] = jnp.pad(nb[...], ((0, 0), (0, 125)))
        cp2 = pltpu.make_async_copy(wb, o_ref, sem)
        cp2.start(); cp2.wait()
    run("3a narrow-lane scratch", "FAIL", k_narrow,
        [pltpu.VMEM((8, 3), jnp.float32),
         pltpu.VMEM((8, 128), jnp.float32)], x8, (8, 128))

    # 3b. narrow value transposes (expected OK, exact)
    def k_transpose(x_ref, o_ref, b8, b4, sem):
        cp = pltpu.make_async_copy(x_ref, b8, sem)
        cp.start(); cp.wait()
        v8 = b8[...]
        xi = v8[0:3, :].T               # (128, 3)
        mci = v8[3:4, :].T              # (128, 1)
        tile = xi * mci
        b4[...] = jnp.concatenate(
            [tile.T, jnp.zeros((1, 128), jnp.float32)], axis=0)
        cp2 = pltpu.make_async_copy(b4, o_ref, sem)
        cp2.start(); cp2.wait()
    run("3b narrow value transpose", "OK", k_transpose,
        [pltpu.VMEM((8, 128), jnp.float32),
         pltpu.VMEM((4, 128), jnp.float32)], x8, (4, 128))

    # 4. remote DMA to self at P=1 (expected OK)
    def k_remote(x_ref, o_ref, vbuf, sem, ssem, rsem):
        cp = pltpu.make_async_copy(x_ref, vbuf, sem)
        cp.start(); cp.wait()
        rc = pltpu.make_async_remote_copy(
            src_ref=vbuf, dst_ref=o_ref, send_sem=ssem, recv_sem=rsem,
            device_id=0, device_id_type=pltpu.DeviceIdType.LOGICAL)
        rc.start(); rc.wait()
    try:
        out = pl.pallas_call(
            k_remote,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(x8)
        ok = bool(np.array_equal(np.asarray(out), np.asarray(x8)))
        print(f"4 remote DMA to self: OK exact={ok} (expected OK)")
    except Exception as e:
        print(f"4 remote DMA to self: FAIL (expected OK) — {str(e)[:90]}")


if __name__ == "__main__":
    main()
