"""Bounded-program dispatch ON A MESH — sharding x prog_cap composition.

The reference's driver runs any configured N through one loop
(``main.cpp:142-160``); the rebuild's single-device path keeps that
promise at any N by splitting one force evaluation into multiple bounded
device programs (``ops/forces_pallas_sym.forces_pallas_sym_chunked``)
when a fused program would exceed an execution-time limit.  This module
closes the multi-chip gap (VERDICT round 3 #1): the same bound applied
PER CHIP under ``shard_map``, so a mesh can run any N a single chip can
— previously sharded runs compiled the whole step (self sweep + all ring
rotations) into ONE program per chip and simply warned when that program
would be killed.

Design: the N3L ring sweep (``parallel/ring.py::ring_forces_local_sym``)
is restructured as a HOST-DRIVEN sequence of compile-once
``jit(shard_map(...))`` programs, each bounded to ``prog_cap``
interactions per chip:

- self sweep: the per-panel diagonal+triangular program (linear in C),
  then cross-panel pair batches — exactly the single-device chunked
  dispatcher's decomposition, run per shard;
- each ring rotation: a tiny rotate program (``ppermute`` of the visiting
  shard + travel accumulator), then the rotation's rectangular sweep
  split along the visiting side's panel axis into batches (a
  compile-once dynamic-offset scan, like ``_sym_pair_batch_prog``);
- even meshes: the antipodal one-sided sweep split along the i-row axis
  (rows are independent in a one-sided sweep, so row slices at dynamic
  offsets reproduce the fused values bitwise);
- a return program ships the travel accumulator home.

Accumulation order is kept IDENTICAL to the fused mesh step (per-panel
additions happen in the same sequence, per-rotation partial sums fold
into the running accumulator at the same points), so results are
BIT-EQUAL to ``run_steps_sharded`` — gated by tests/test_mesh_multiprog.py
on 8/5/4/2/1-device CPU meshes.

State stays device-resident (sharded) across programs; the only added
cost is per-program dispatch latency, exactly like the single-device
multiprog path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..models.integrators import KDK_WEIGHTS
from ..models.state import SimState, pad_state_to, round_up, unpad_state
from ..ops.forces_pallas_sym import (DEFAULT_PROG_CAP, _inv_mass_scale,
                                     _panel_layout, _rect_call,
                                     _rect_panel_layout,
                                     _sym_pair_batch_prog,
                                     _sym_self_batch_prog, _unscatter,
                                     _validate_sym_blocks, default_panel_nb,
                                     resolve_block_u, resolve_schedule)
from .mesh import SHARD_AXIS
from .ring import (_RECT_VARIANTS, _SYM_VARIANTS, _resolve_local_impl,
                   shard_padding)


# One rotation's rect sweep decomposes with rect_forces_sym's OWN layout
# helper (forces_pallas_sym._rect_panel_layout) so the bounded split
# happens exactly at the fused path's accumulation boundaries — the
# bit-equality contract forbids a forked copy of the formula (review r4).
_rect_layout = _rect_panel_layout


@functools.lru_cache(maxsize=16)
def _mesh_programs(mesh: Mesh, axis: str, c: int, eps2: float, block_i: int,
                   block_u: int, nb_self: int, panels_self: int, nb_b: int,
                   panels_b: int, variant: str, rect_variant: str,
                   anti_block_i: int, anti_block_j: int, anti_rows: int,
                   interpret: bool, schedule: str):
    """Compile-once jitted shard_map programs for one (mesh, geometry).

    Every program is ``jit(shard_map(local_fn))`` over 1-D body-sharded
    operands; panel/offset id vectors are replicated.  Cached so repeated
    steps/chunks reuse the same traced callables (rebuilding jit wrappers
    per call would retrace every chunk)."""
    p = mesh.shape[axis]
    S = P(axis)
    R = P()                       # replicated (id vectors)
    half = (p - 1) // 2
    fwd = [(i, (i + 1) % p) for i in range(p)]
    back = [(i, (i - half) % p) for i in range(p)]
    m_self = nb_self * block_u
    n_pad_self = panels_self * m_self
    na_pad = round_up(c, block_i)
    m_b = nb_b * block_u
    nb_pad = panels_b * m_b

    def sm(fn, in_specs, out_specs):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False))

    # ---- self sweep (the single-device chunked decomposition, per shard)
    def self0_local(pos_l, mass_l):
        pad = n_pad_self - c
        pos_flat = jnp.pad(pos_l, ((0, pad), (0, 0))).reshape(-1)
        mass_p = jnp.pad(mass_l, (0, pad))
        acc = jnp.zeros_like(pos_flat)
        return _sym_self_batch_prog(
            pos_flat, mass_p, acc,
            jnp.arange(panels_self, dtype=jnp.int32), eps2, block_i,
            block_u, nb_self, variant, interpret, schedule)

    def selfpair_local(pos_l, mass_l, acc_flat, a_ids, b_ids, w):
        pad = n_pad_self - c
        pos_flat = jnp.pad(pos_l, ((0, pad), (0, 0))).reshape(-1)
        mass_p = jnp.pad(mass_l, (0, pad))
        return _sym_pair_batch_prog(
            pos_flat, mass_p, acc_flat, a_ids, b_ids, w, eps2, block_i,
            block_u, nb_self, variant, interpret, schedule)

    def selffin_local(acc_flat):
        return acc_flat.reshape(n_pad_self, 3)[:c]

    # ---- one ring rotation's rect sweep, split along the visiting side's
    # panel axis (the fused path's own per-q accumulation boundary).
    # ``rot_aa`` accumulates this rotation's i-side sum starting from
    # zeros (folded into acc_i by the NEXT rotate/return program, exactly
    # where the fused path adds its per-rotation total).
    def rect_local(pos_l, mass_l, pos_j, mass_j, rot_aa, acc_t, q_ids, w):
        pos_a_p = jnp.pad(pos_l, ((0, na_pad - c), (0, 0)))
        mass_a_p = jnp.pad(mass_l, (0, na_pad - c))
        mass_col_a = mass_a_p[:, None]
        pos_b_flat = jnp.pad(pos_j, ((0, nb_pad - c), (0, 0))).reshape(-1)
        mass_b_p = jnp.pad(mass_j, (0, nb_pad - c))
        acc_tf = jnp.pad(acc_t, ((0, nb_pad - c), (0, 0))).reshape(-1)

        def body(carry, item):
            rot_aa, acc_tf = carry
            q, wt = item
            ob = 3 * q * m_b
            pb = jax.lax.dynamic_slice(
                pos_b_flat, (ob,), (3 * m_b,)).reshape(m_b, 3)
            mb = jax.lax.dynamic_slice(mass_b_p, (q * m_b,), (m_b,))
            aa, abT = _rect_call(
                pos_a_p, mass_col_a, pb.T, mb[None, :], pb, mb[:, None],
                eps2=eps2, nb_b=nb_b, block_i=block_i, block_u=block_u,
                variant=variant, interpret=interpret, schedule=schedule)
            rot_aa = rot_aa + wt * _inv_mass_scale(aa, mass_a_p, variant)[:c]
            ab = _inv_mass_scale(_unscatter(abT), mb, variant)
            cur = jax.lax.dynamic_slice(acc_tf, (ob,), (3 * m_b,))
            acc_tf = jax.lax.dynamic_update_slice(
                acc_tf, cur + wt * ab.reshape(-1), (ob,))
            return (rot_aa, acc_tf), None

        (rot_aa, acc_tf), _ = jax.lax.scan(
            body, (rot_aa, acc_tf), (q_ids, w))
        return rot_aa, acc_tf.reshape(nb_pad, 3)[:c]

    # ---- rotate / fold programs (tiny: ppermute + one elementwise add)
    def rot_first_local(pos_j, mass_j, acc_t):
        return (jax.lax.ppermute(pos_j, axis, fwd),
                jax.lax.ppermute(mass_j, axis, fwd),
                jax.lax.ppermute(acc_t, axis, fwd))

    def rot_fold_local(acc_i, rot_aa, pos_j, mass_j, acc_t):
        return (acc_i + rot_aa,
                jax.lax.ppermute(pos_j, axis, fwd),
                jax.lax.ppermute(mass_j, axis, fwd),
                jax.lax.ppermute(acc_t, axis, fwd))

    def rot2_first_local(pos_j, mass_j):
        return (jax.lax.ppermute(pos_j, axis, fwd),
                jax.lax.ppermute(mass_j, axis, fwd))

    def rot2_fold_local(acc_i, rot_aa, pos_j, mass_j):
        return (acc_i + rot_aa,
                jax.lax.ppermute(pos_j, axis, fwd),
                jax.lax.ppermute(mass_j, axis, fwd))

    # ---- even-P antipodal one-sided sweep, split along i-rows (rows of a
    # one-sided sweep are independent; slices write — not add — into a
    # zeros buffer, so ragged tails may overlap and recompute identical
    # values).  One final add of the whole buffer matches the fused
    # path's single ``acc_i + anti`` association.
    def anti_local(pos_l, pos_j, mass_j, anti, offs):
        from ..ops.forces_pallas import rect_forces_pallas

        def body(anti, off):
            rows = jax.lax.dynamic_slice(pos_l, (off, 0), (anti_rows, 3))
            aa = rect_forces_pallas(
                rows, pos_j, mass_j, eps2, block_i=anti_block_i,
                block_j=anti_block_j, variant=rect_variant,
                interpret=interpret, self_tile=False)
            return jax.lax.dynamic_update_slice(anti, aa, (off, 0)), None

        anti, _ = jax.lax.scan(body, anti, offs)
        return anti

    # ---- final combine (same association as the fused path's epilogue)
    def ret_odd_local(acc_i, rot_aa, acc_t):
        a = acc_i + rot_aa
        return a + jax.lax.ppermute(acc_t, axis, back)

    def ret_even_local(acc_i, anti, acc_t):
        a = acc_i + anti
        return a + jax.lax.ppermute(acc_t, axis, back)

    def ret_p2_local(acc_i, anti):
        return acc_i + anti

    return {
        "self0": sm(self0_local, (S, S), S),
        "selfpair": sm(selfpair_local, (S, S, S, R, R, R), S),
        "selffin": sm(selffin_local, (S,), S),
        "rect": sm(rect_local, (S, S, S, S, S, S, R, R), (S, S)),
        "rot_first": sm(rot_first_local, (S, S, S), (S, S, S)),
        "rot_fold": sm(rot_fold_local, (S, S, S, S, S), (S, S, S, S)),
        "rot2_first": sm(rot2_first_local, (S, S), (S, S)),
        "rot2_fold": sm(rot2_fold_local, (S, S, S, S), (S, S, S)),
        "anti": sm(anti_local, (S, S, S, S, R), S),
        "ret_odd": sm(ret_odd_local, (S, S, S), S),
        "ret_even": sm(ret_even_local, (S, S, S), S),
        "ret_p2": sm(ret_p2_local, (S, S), S),
    }


class _ShardedBoundedForces:
    """One mesh force evaluation as a sequence of bounded programs.

    Precomputes the per-chip geometry and program plan for a (cfg, mesh,
    impl) triple; ``__call__(pos, mass, zeros3, progress)`` runs one
    evaluation and returns the sharded ``(padded_N, 3)`` accelerations.
    """

    def __init__(self, cfg: SimConfig, mesh: Mesh, impl: str,
                 cap: float, axis: str = SHARD_AXIS):
        variant = _SYM_VARIANTS.get(impl)
        if variant is None:
            raise ValueError(
                f"sharded bounded-program dispatch requires a pallas_sym* "
                f"impl, got {impl!r}")
        self.axis = axis
        self.p = p = mesh.shape[axis]
        n_pad = shard_padding(cfg, p)
        self.c = c = n_pad // p
        self.cap = cap
        block_u = resolve_block_u(cfg.block_u, c, variant)
        schedule = resolve_schedule(None, variant)
        panel_nb_self = cfg.panel_nb or default_panel_nb(block_u)
        nb_self, panels_self = _panel_layout(c, block_u, panel_nb_self)
        _validate_sym_blocks(cfg.block_i, block_u, nb_self, schedule)
        nb_b, panels_b = _rect_layout(c, block_u, cfg.panel_nb)
        _validate_sym_blocks(cfg.block_i, block_u, nb_b, schedule)
        interpret = jax.default_backend() != "tpu"

        # Program plan (per-chip interaction accounting; each unordered
        # pair delivers 2 of the N²-per-eval metric unit).
        m_self = nb_self * block_u
        self.panels_self = panels_self
        self.pairs_self = panels_self * (panels_self - 1) // 2
        per_self = max(1, int(cap // (2.0 * m_self * m_self)))
        self.n_self_prog = (-(-self.pairs_self // per_self)
                            if self.pairs_self else 0)
        na_pad = round_up(c, cfg.block_i)
        m_b = nb_b * block_u
        self.panels_b = panels_b
        per_rect = max(1, int(cap // (2.0 * na_pad * m_b)))
        self.n_rect_prog = -(-panels_b // per_rect)
        self.half = (p - 1) // 2

        # Antipodal (even P) i-row split: slice height targets cap/C
        # interactions per slice, block_i-aligned; ragged tails overlap
        # (recompute + overwrite identical rows).
        anti_rows = min(c, max(cfg.block_i,
                               int(cap // max(1, c))
                               // cfg.block_i * cfg.block_i))
        self.anti_rows = anti_rows
        n_slices = -(-c // anti_rows)
        self.anti_offs = [min(i * anti_rows, c - anti_rows)
                          for i in range(n_slices)]
        per_anti = max(1, int(cap // (float(anti_rows) * c)))
        self.n_anti_prog = -(-n_slices // per_anti)
        self.anti_batch = -(-n_slices // self.n_anti_prog)

        self.total_programs = 1 + self.n_self_prog
        if p > 1:
            self.total_programs += self.half * self.n_rect_prog
            if p % 2 == 0:
                self.total_programs += self.n_anti_prog

        self.progs = _mesh_programs(
            mesh, axis, c, float(cfg.eps2), cfg.block_i, block_u, nb_self,
            panels_self, nb_b, panels_b, variant,
            _RECT_VARIANTS[impl], cfg.block_i, cfg.block_j, anti_rows,
            interpret, schedule)

    def _self_batches(self):
        pairs = [(a, b) for a in range(self.panels_self)
                 for b in range(a + 1, self.panels_self)]
        if not pairs:
            return
        batch = -(-len(pairs) // self.n_self_prog)
        for lo in range(0, len(pairs), batch):
            chunk = pairs[lo:lo + batch]
            npad = batch - len(chunk)
            chunk = chunk + [(0, 1)] * npad
            yield (np.asarray([x[0] for x in chunk], np.int32),
                   np.asarray([x[1] for x in chunk], np.int32),
                   np.asarray([1.0] * (len(chunk) - npad) + [0.0] * npad,
                              np.float32))

    def _rect_batches(self):
        qs = list(range(self.panels_b))
        batch = -(-len(qs) // self.n_rect_prog)
        for lo in range(0, len(qs), batch):
            chunk = qs[lo:lo + batch]
            npad = batch - len(chunk)
            yield (np.asarray(chunk + [0] * npad, np.int32),
                   np.asarray([1.0] * len(chunk) + [0.0] * npad,
                              np.float32))

    def __call__(self, pos, mass, zeros3, progress=None):
        progs = self.progs
        done = 0

        def tick(handle):
            nonlocal done
            done += 1
            if progress is not None:
                progress(done, self.total_programs, handle)

        accf = progs["self0"](pos, mass)
        tick(accf)
        for a_ids, b_ids, w in self._self_batches():
            accf = progs["selfpair"](pos, mass, accf, a_ids, b_ids, w)
            tick(accf)
        acc_i = progs["selffin"](accf)
        if self.p == 1:
            return acc_i

        pos_j, mass_j, acc_t = pos, mass, zeros3
        rot_aa = zeros3
        for d in range(1, self.half + 1):
            if d == 1:
                pos_j, mass_j, acc_t = progs["rot_first"](
                    pos_j, mass_j, acc_t)
            else:
                acc_i, pos_j, mass_j, acc_t = progs["rot_fold"](
                    acc_i, rot_aa, pos_j, mass_j, acc_t)
                rot_aa = zeros3
            for q_ids, w in self._rect_batches():
                rot_aa, acc_t = progs["rect"](
                    pos, mass, pos_j, mass_j, rot_aa, acc_t, q_ids, w)
                tick(rot_aa)

        if self.p % 2 == 0:
            if self.p == 2:
                pos_j, mass_j = progs["rot2_first"](pos_j, mass_j)
            else:
                acc_i, pos_j, mass_j = progs["rot2_fold"](
                    acc_i, rot_aa, pos_j, mass_j)
            anti = zeros3
            for lo in range(0, len(self.anti_offs), self.anti_batch):
                chunk = self.anti_offs[lo:lo + self.anti_batch]
                # Pad ragged batches by repeating the last offset (the
                # overwrite is value-identical).
                chunk = chunk + [chunk[-1]] * (self.anti_batch - len(chunk))
                offs = np.asarray(chunk, np.int32)
                anti = progs["anti"](pos, pos_j, mass_j, anti, offs)
                tick(anti)
            if self.p == 2:
                return progs["ret_p2"](acc_i, anti)
            return progs["ret_even"](acc_i, anti, acc_t)
        return progs["ret_odd"](acc_i, rot_aa, acc_t)


def prime_kdk_sharded_multiprog(
        state: SimState, cfg: SimConfig, mesh: Mesh,
        impl: Optional[str] = None,
        max_prog_interactions: "float | None" = None,
        progress=None, axis: str = SHARD_AXIS) -> SimState:
    """Seed ``state.acc = a(x_0)`` through the bounded mesh dispatcher —
    ONE force evaluation split into per-chip bounded programs (the
    priming analog of ``run_steps_sharded_multiprog``; a fused priming
    eval at mesh-multiprog N is exactly the over-long program the cap
    exists to avoid)."""
    local_impl = _resolve_local_impl(impl, sym_default=True)
    cap = max_prog_interactions or cfg.prog_cap or DEFAULT_PROG_CAP
    forces = _ShardedBoundedForces(cfg, mesh, local_impl, cap, axis=axis)
    n_real = state.n
    state = pad_state_to(state, shard_padding(cfg, mesh.shape[axis]))
    sharding = NamedSharding(mesh, P(axis))
    pos = jax.device_put(state.pos, sharding)
    mass = jax.device_put(state.mass, sharding)
    zeros3 = jax.device_put(jnp.zeros_like(state.pos), sharding)
    acc = forces(pos, mass, zeros3, progress=progress)
    out = state._replace(pos=pos, mass=mass, acc=acc)
    return unpad_state(out, n_real)


def run_steps_sharded_multiprog(
        state: SimState, cfg: SimConfig, mesh: Mesh, n_steps: int,
        impl: Optional[str] = None, comm: str = "ring",
        max_prog_interactions: "float | None" = None,
        progress=None, axis: str = SHARD_AXIS) -> SimState:
    """``run_steps_sharded`` with each chip's force evaluation split into
    bounded device programs (the mesh twin of ``run_steps_multiprog``).

    Results are BIT-EQUAL to the fused ``run_steps_sharded`` with
    ``comm='ring'`` (tests/test_mesh_multiprog.py); only ``comm='ring'``
    has a bounded decomposition (allgather materializes the whole j-side
    in one local sweep and the fused RDMA ring is one kernel by design).
    State stays device-resident (sharded) between programs.
    """
    if comm != "ring":
        raise ValueError(
            f"bounded-program mesh dispatch rides the N3L ring "
            f"(comm='ring'); got comm={comm!r} — allgather/rdma sweeps "
            f"have no bounded split")
    local_impl = _resolve_local_impl(impl, sym_default=True)
    cap = max_prog_interactions or cfg.prog_cap or DEFAULT_PROG_CAP
    forces = _ShardedBoundedForces(cfg, mesh, local_impl, cap, axis=axis)

    n_real = state.n
    p = mesh.shape[axis]
    state = pad_state_to(state, shard_padding(cfg, p))
    sharding = NamedSharding(mesh, P(axis))
    pos = jax.device_put(state.pos, sharding)
    vel = jax.device_put(state.vel, sharding)
    acc = jax.device_put(state.acc, sharding)
    mass = jax.device_put(state.mass, sharding)
    zeros3 = jax.device_put(
        jnp.zeros_like(state.pos), sharding)

    from ..ops.step import _drift_jit, _kick_jit, _ref_update_jit
    weights = KDK_WEIGHTS.get(cfg.integrator)
    for _ in range(n_steps):
        if cfg.integrator == "reference":
            acc = forces(pos, mass, zeros3, progress=progress)
            pos, vel = _ref_update_jit(pos, vel, acc, cfg.dt)
        elif weights is not None:
            for w in weights:
                wdt = w * cfg.dt
                vel_half = _kick_jit(vel, acc, wdt)
                pos = _drift_jit(pos, vel_half, wdt)
                acc = forces(pos, mass, zeros3, progress=progress)
                vel = _kick_jit(vel_half, acc, wdt)
        else:
            raise ValueError(f"unknown integrator {cfg.integrator!r}")
    out = SimState(pos=pos, vel=vel, acc=acc, mass=mass)
    return unpad_state(out, n_real)
