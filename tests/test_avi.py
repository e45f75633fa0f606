"""MJPEG-AVI writer: container structure, index integrity, frame
round-trip (decode the JPEG chunks back and compare), CLI integration."""

import os
import struct

import numpy as np
import pytest

import conftest  # noqa: F401

from nbody_tpu.viz.avi import AviWriter, write_avi


def _frames(n=6, h=48, w=64, seed=0):
    """Smooth gradient frames (JPEG-friendly; random noise is the lossy
    codec's worst case and says nothing about correctness)."""
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for k in range(n):
        f = np.stack([(xx * 255 / w + 10 * k) % 256,
                      (yy * 255 / h) % 256,
                      np.full_like(xx, 30 * k % 256)], axis=-1)
        out.append(f.astype(np.uint8))
    return out


def _parse_avi(path, cid=b"00dc"):
    """Minimal RIFF walk: returns (n_frames_header, chunks, idx_entries)."""
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    total = struct.unpack("<I", data[4:8])[0]
    assert total == len(data) - 8
    # avih sits at a fixed offset: RIFF(12) LIST(8) hdrl(4) avih-hdr(8)
    assert data[24:28] == b"avih"
    n_frames = struct.unpack("<I", data[32 + 16:32 + 20])[0]
    movi = data.index(b"movi")
    # The movi LIST's declared size must end exactly at idx1 (RIFF walkers
    # resume parsing right after the list).
    movi_size = struct.unpack("<I", data[movi - 4:movi])[0]
    assert data[movi + movi_size:movi + movi_size + 4] == b"idx1"
    chunks = []
    p = movi + 4
    while data[p:p + 4] == cid:
        size = struct.unpack("<I", data[p + 4:p + 8])[0]
        chunks.append(data[p + 8:p + 8 + size])
        p += 8 + size + (size % 2)
    assert data[p:p + 4] == b"idx1"
    n_idx = struct.unpack("<I", data[p + 4:p + 8])[0] // 16
    idx = []
    for k in range(n_idx):
        e = data[p + 8 + 16 * k:p + 8 + 16 * (k + 1)]
        assert e[:4] == cid
        flags, off, size = struct.unpack("<3I", e[4:])
        idx.append((flags, off, size))
    return n_frames, chunks, idx


def test_avi_structure_and_roundtrip(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image
    import io
    path = str(tmp_path / "out.avi")
    frames = _frames()
    n = write_avi(path, frames, fps=10, quality=95)
    assert n == len(frames)
    n_hdr, chunks, idx = _parse_avi(path)
    assert n_hdr == len(frames) and len(chunks) == len(frames)
    assert len(idx) == len(frames)
    # Index offsets point at the right chunks (offset from 'movi' fourcc).
    data = open(path, "rb").read()
    movi = data.index(b"movi")
    for (flags, off, size), chunk in zip(idx, chunks):
        assert flags == 0x10
        p = movi + off
        assert data[p:p + 4] == b"00dc"
        assert struct.unpack("<I", data[p + 4:p + 8])[0] == size == len(chunk)
    # JPEG round-trip: decoded pixels within lossy tolerance.
    decoded = np.asarray(Image.open(io.BytesIO(chunks[0])).convert("RGB"))
    assert decoded.shape == frames[0].shape
    assert np.mean(np.abs(decoded.astype(int) - frames[0].astype(int))) < 24


def test_avi_dib_codec_lossless(tmp_path):
    """The no-PIL fallback codec is raw DIB — byte-exact round-trip."""
    path = str(tmp_path / "raw.avi")
    frames = _frames(3)
    with AviWriter(path, 64, 48, fps=5, codec="DIB ") as av:
        for fr in frames:
            av.add(fr)
    # Uncompressed DIB frames carry the '00db' chunk fourcc ('dc' is for
    # compressed streams; strict demuxers key off the suffix).
    _, chunks, _ = _parse_avi(path, cid=b"00db")
    h, w = 48, 64
    for fr, chunk in zip(frames, chunks):
        rows = np.frombuffer(chunk, np.uint8).reshape(h, -1)[:, :w * 3]
        bgr = rows.reshape(h, w, 3)[::-1]
        np.testing.assert_array_equal(bgr[:, :, ::-1], fr)


def test_cli_render_avi(tmp_path):
    from nbody_tpu.cli import main
    from nbody_tpu.io.checkpoint import save_trajectory
    rng = np.random.default_rng(1)
    snaps = rng.uniform(-2e5, 2e5, (4, 32, 3)).astype(np.float32)
    mass = rng.uniform(1e5, 1e9, 32).astype(np.float32)
    traj = str(tmp_path / "t.npz")
    save_trajectory(traj, snaps, 1, mass=mass)
    avi = str(tmp_path / "t.avi")
    rc = main(["render", traj, "--out-dir", str(tmp_path / "f"),
               "--width", "64", "--height", "48", "--avi", avi])
    assert rc == 0
    n_hdr, chunks, _ = _parse_avi(avi)
    assert n_hdr == 4 and len(chunks) == 4


def test_cli_run_viz_avi(tmp_path):
    """--viz-avi writes a playable AVI during a live run."""
    from nbody_tpu.cli import main
    avi = str(tmp_path / "run.avi")
    rc = main(["run", "--n", "64", "--steps", "4", "--impl", "xla_nxn",
               "--viz-avi", avi, "--viz-every", "2", "--quiet"])
    assert rc == 0
    n_hdr, chunks, _ = _parse_avi(avi)
    assert n_hdr == len(chunks) == 2
