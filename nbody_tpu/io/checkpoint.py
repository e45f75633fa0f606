"""Checkpoint / resume.

The reference has no persistence — a run's outputs die with the process
(``main.cpp:361-366``; SURVEY.md section 5).  The rebuild adds NPZ
save/restore of ``(pos, vel, acc, mass, step, config)`` so long runs and the
1k-step validation can resume.  NPZ is the default (zero extra deps,
host-level IO); an Orbax adapter is provided for users already in that
ecosystem.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..models.state import SimState


def save_checkpoint(path: str, state: SimState, step: int,
                    cfg: Optional[SimConfig] = None) -> None:
    """Atomic NPZ checkpoint write (tmp file + rename)."""
    payload = {
        "pos": np.asarray(state.pos),
        "vel": np.asarray(state.vel),
        "acc": np.asarray(state.acc),
        "mass": np.asarray(state.mass),
        "step": np.asarray(step, dtype=np.int64),
    }
    if cfg is not None:
        payload["config_json"] = np.frombuffer(
            json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8)
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, dtype=None
                    ) -> Tuple[SimState, int, Optional[SimConfig]]:
    """Load (state, step, config-or-None) from an NPZ checkpoint.

    ``dtype=None`` keeps the checkpoint's stored precision (a float64 run
    resumes in float64 when x64 is enabled); pass a dtype to convert."""
    with np.load(path) as z:
        state = SimState(
            pos=jnp.asarray(z["pos"], dtype=dtype),
            vel=jnp.asarray(z["vel"], dtype=dtype),
            acc=jnp.asarray(z["acc"], dtype=dtype),
            mass=jnp.asarray(z["mass"], dtype=dtype),
        )
        step = int(z["step"])
        cfg = None
        if "config_json" in z:
            raw = json.loads(bytes(z["config_json"].tobytes()).decode())
            known = {f.name for f in dataclasses.fields(SimConfig)}
            cfg = SimConfig(**{k: v for k, v in raw.items() if k in known})
    return state, step, cfg


def save_trajectory(path: str, snapshots: np.ndarray,
                    snap_every: int, cfg: Optional[SimConfig] = None,
                    mass: Optional[np.ndarray] = None) -> None:
    """NPZ trajectory export (positions over time) — the persistent
    replacement for the reference's render-only output.

    ``mass`` must be persisted for faithful rendering: the reference's
    central visual semantic is the mass->color lerp
    (simulation_visualization.cpp:46-56), which needs per-body masses at
    render time."""
    payload = {"snapshots": np.asarray(snapshots),
               "snap_every": np.asarray(snap_every, dtype=np.int64)}
    if mass is not None:
        payload["mass"] = np.asarray(mass)
    if cfg is not None:
        payload["config_json"] = np.frombuffer(
            json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


# --- Orbax adapter (optional; orbax-checkpoint is in the base image) -------

def save_checkpoint_orbax(directory: str, state: SimState, step: int) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(directory, f"step_{step}")),
               {"pos": state.pos, "vel": state.vel, "acc": state.acc,
                "mass": state.mass},
               force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(directory: str, step: int) -> SimState:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(
        os.path.abspath(os.path.join(directory, f"step_{step}")))
    return SimState(pos=tree["pos"], vel=tree["vel"], acc=tree["acc"],
                    mass=tree["mass"])
