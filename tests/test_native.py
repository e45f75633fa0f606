"""Native C++/OpenMP oracle + native PNG encoder (native/nbody_native.cpp).

Three-way cross-check: native oracle vs NumPy oracle vs device paths — the
rebuild's version of the reference's independent-CPU-implementation strategy
(validation.cpp), with one more independent implementation than the reference
had.
"""

import numpy as np
import pytest

from nbody_tpu.oracle import native
from nbody_tpu.oracle.numpy_oracle import oracle_forces, oracle_run
from conftest import make_small_system

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (needs g++)")

EPS2, DT = 0.002, 0.1


def test_native_forces_match_numpy_f64():
    pos, _, mass = make_small_system(512, seed=40)
    a_native = native.native_forces(pos, mass, EPS2, dtype=np.float64)
    a_numpy = oracle_forces(pos, mass, EPS2, dtype=np.float64)
    np.testing.assert_allclose(a_native, a_numpy, rtol=1e-12, atol=1e-12)


def test_native_forces_f32():
    pos, _, mass = make_small_system(256, seed=41)
    a32 = native.native_forces(pos, mass, EPS2, dtype=np.float32)
    a64 = oracle_forces(pos, mass, EPS2, dtype=np.float64)
    np.testing.assert_allclose(a32, a64, rtol=1e-3, atol=1e-3)


def test_native_run_matches_numpy():
    pos, vel, mass = make_small_system(128, seed=42)
    npos, nvel, nacc = native.native_run(pos, vel, mass, EPS2, DT, 10)
    opos, ovel, oacc = oracle_run(pos, vel, mass, EPS2, DT, 10)
    np.testing.assert_allclose(npos, opos, rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(nvel, ovel, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(nacc, oacc, rtol=1e-10, atol=1e-12)


def test_native_kdk_matches_numpy():
    """Native KDK leapfrog twin (drift-gate oracle for --integrator kdk)."""
    pos, vel, mass = make_small_system(128, seed=43)
    npos, nvel, nacc = native.native_run(pos, vel, mass, EPS2, DT, 10,
                                         integrator="kdk")
    opos, ovel, oacc = oracle_run(pos, vel, mass, EPS2, DT, 10,
                                  integrator="kdk")
    np.testing.assert_allclose(npos, opos, rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(nvel, ovel, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(nacc, oacc, rtol=1e-10, atol=1e-12)


def test_native_threads():
    assert native.num_threads() >= 1


def test_native_png_roundtrip(tmp_path):
    from nbody_tpu.viz import native_png
    from nbody_tpu.viz.png import encode_png as py_encode, read_png_size
    rgb = (np.random.default_rng(1).uniform(0, 255, (32, 40, 3))
           .astype(np.uint8))
    data = native_png.encode_png(rgb)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    p = str(tmp_path / "n.png")
    native_png.write_png(p, rgb)
    assert read_png_size(p) == (40, 32)
    # Decode both encoders' IDAT and compare raw scanlines.
    import struct, zlib

    def raw(data):
        off, idat = 8, b""
        while off < len(data):
            (ln,) = struct.unpack(">I", data[off:off + 4])
            if data[off + 4:off + 8] == b"IDAT":
                idat += data[off + 8:off + 8 + ln]
            off += 12 + ln
        return zlib.decompress(idat)

    assert raw(data) == raw(py_encode(rgb))
