"""Multi-chip ring all-pairs sweep — the ICI lift of the reference's
intra-GPU tile sweep.

The reference streams the full position set through shared memory in
block-sized tiles (``kernel.cu:96-114``); here bodies are sharded across a
1-D device mesh and the *j-side* (positions + masses) rotates around the ICI
ring with ``lax.ppermute`` so every chip's i-shard meets every position in P
hops — structurally ring attention applied to the interaction matrix
(SURVEY.md sections 2.3 and 5).  An ``all_gather`` variant (gather the whole
position set, then one local sweep) is provided as the Ulysses-style
alternative for small N.

Everything (ring sweep + fused integration + the multi-step loop) lives
inside one ``shard_map``-over-``jit`` program: zero host round-trips, and the
collective-permute is compiled onto the ICI ring by XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..models.integrators import (KDK_WEIGHTS, kdk_drift, kdk_kick,
                                  reference_update)
from ..models.state import SimState, pad_state_to, round_up, unpad_state
from ..ops.forces_xla import rect_forces
from .mesh import SHARD_AXIS


# impl -> one-sided rect kernel variant (the allgather path, and the
# antipodal step of the even-P sym ring).  The pair-symmetric impls map to
# their one-sided accuracy twins where a one-sided sweep is required.
_RECT_VARIANTS = {"pallas": "vpu", "pallas_sym": "vpu",
                  "pallas_sym2": "vpu", "pallas_kahan": "vpu_kahan",
                  "pallas_mxu": "mxu", "pallas_fast": "fast",
                  "pallas_turbo": "turbo", "pallas_sym_turbo": "turbo",
                  "pallas_sym_turbo2": "turbo", "pallas_sym_mxu": "mxu"}

# impl -> pair-symmetric kernel variant: these route comm="ring" through
# the N3L ring (ring_forces_local_sym), which computes every unordered
# cross-shard pair ONCE.
_SYM_VARIANTS = {"pallas_sym": "vpu", "pallas_sym2": "vpu2",
                 "pallas_sym_turbo": "turbo",
                 "pallas_sym_turbo2": "turbo2", "pallas_sym_mxu": "mxu"}


def _local_rect_forces(pos_i, pos_j, mass_j, cfg: SimConfig, impl: str,
                       self_tile: bool = False):
    """Per-chip (i-shard x j-tile) force block.

    ``self_tile`` marks the rotation where the j tile IS the chip's own
    shard (local index equality = same body): the masked mxu/fast/turbo
    variants apply their self-pair mask only there, and skip it entirely
    on disjoint rotations (masking would zero legitimate pairs)."""
    if impl.startswith("pallas"):
        from ..ops.forces_pallas import rect_forces_pallas
        variant = _RECT_VARIANTS.get(impl)
        if variant is None:
            raise ValueError(f"unsupported sharded pallas impl {impl!r}")
        return rect_forces_pallas(
            pos_i, pos_j, mass_j, cfg.eps2,
            block_i=cfg.block_i, block_j=cfg.block_j,
            variant=variant, self_tile=self_tile)
    return rect_forces(pos_i, pos_j, mass_j, cfg.eps2, chunk=cfg.chunk)


def _resolve_local_impl(impl: Optional[str], sym_default: bool = False
                        ) -> str:
    """Resolve None/'auto' for the sharded entry points.

    ``sym_default``: the caller only accepts the pair-symmetric ladder
    (the bounded mesh dispatcher) or prefers it (the fused RDMA ring,
    whose kernels run in interpret mode off-TPU) — resolve to the
    production exact tier instead of the one-sided/XLA local default,
    which those paths would reject (review r4)."""
    if impl is not None and impl != "auto":
        return impl
    if sym_default:
        return "pallas_sym2"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def ring_forces_local(pos_l, mass_l, cfg: SimConfig, impl: str,
                      axis: str = SHARD_AXIS):
    """Ring sweep, written per-shard (call inside shard_map): accumulate
    forces from P rotating j-tiles.

    Rotation step 0 (the chip's own shard) is peeled out of the loop so it
    compiles as a separate ``self_tile=True`` kernel instance — the masked
    variants mask self-pairs there and run entirely unmasked on the P-1
    disjoint rotations (no in-kernel branching anywhere)."""
    p = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % p) for i in range(p)]

    acc0 = _local_rect_forces(pos_l, pos_l, mass_l, cfg, impl,
                              self_tile=True)

    def body(step, carry):
        acc, pos_j, mass_j = carry
        # Rotate the j-tile to the next chip, then sweep it.  XLA's async
        # collective-permute scheduling provides the compute/comm overlap
        # across iterations.
        pos_j = jax.lax.ppermute(pos_j, axis, perm)
        mass_j = jax.lax.ppermute(mass_j, axis, perm)
        acc = acc + _local_rect_forces(pos_l, pos_j, mass_j, cfg, impl,
                                       self_tile=False)
        return acc, pos_j, mass_j

    acc, _, _ = jax.lax.fori_loop(0, p - 1, body, (acc0, pos_l, mass_l))
    return acc


def ring_forces_local_sym(pos_l, mass_l, cfg: SimConfig, impl: str,
                          axis: str = SHARD_AXIS):
    """Newton's-third-law ring: every unordered shard pair computed ONCE.

    The one-sided ring (``ring_forces_local``) sweeps all P-1 rotations,
    computing every cross-shard pair twice (once on each owner).  Here the
    sweep stops HALFWAY: at rotation d the chip computes its i-shard
    against the visiting shard *two-sided* (``rect_forces_sym``), keeping
    the i-side locally and accumulating the j-side partial into a buffer
    that TRAVELS with the visiting shard; after floor((P-1)/2) rotations
    one final ``ppermute`` ships each travel buffer home.  For even P the
    antipodal offset is its own mirror, so that single rotation runs
    one-sided on both owners.

    Cost per chip vs the one-sided ring: pair work HALVES; comm is
    ~(P-1)/2 hops of (pos 12B + mass 4B + partial 12B) + one 12B return
    hop = ~14(P-1)+12 B/body vs 16(P-1) B/body one-sided — slightly LESS
    total bytes, in half as many (larger) messages.  The self-shard runs
    the triangular pair-symmetric kernel locally.
    """
    from ..ops.forces_pallas_sym import forces_pallas_sym, rect_forces_sym
    variant = _SYM_VARIANTS[impl]
    p = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % p) for i in range(p)]
    half = (p - 1) // 2

    # Self shard: triangular N3L sweep of the chip's own bodies.
    acc_i = forces_pallas_sym(
        pos_l, mass_l, cfg.eps2, block_i=cfg.block_i, block_u=cfg.block_u,
        panel_nb=cfg.panel_nb, variant=variant)

    def body(_, carry):
        acc_i, acc_t, pos_j, mass_j = carry
        pos_j = jax.lax.ppermute(pos_j, axis, fwd)
        mass_j = jax.lax.ppermute(mass_j, axis, fwd)
        acc_t = jax.lax.ppermute(acc_t, axis, fwd)
        aa, ab = rect_forces_sym(
            pos_l, mass_l, pos_j, mass_j, cfg.eps2, block_i=cfg.block_i,
            block_u=cfg.block_u, panel_nb=cfg.panel_nb, variant=variant)
        return acc_i + aa, acc_t + ab, pos_j, mass_j

    acc_t = jnp.zeros_like(pos_l)
    acc_i, acc_t, pos_j, mass_j = jax.lax.fori_loop(
        0, half, body, (acc_i, acc_t, pos_l, mass_l))

    if p % 2 == 0:
        # Antipodal rotation: self-mirrored, computed one-sided everywhere.
        pos_j = jax.lax.ppermute(pos_j, axis, fwd)
        mass_j = jax.lax.ppermute(mass_j, axis, fwd)
        acc_i = acc_i + _local_rect_forces(pos_l, pos_j, mass_j, cfg, impl,
                                           self_tile=False)

    if half > 0:
        back = [(i, (i - half) % p) for i in range(p)]
        acc_i = acc_i + jax.lax.ppermute(acc_t, axis, back)
    return acc_i


def allgather_forces_local(pos_l, mass_l, cfg: SimConfig, impl: str,
                           axis: str = SHARD_AXIS):
    """Ulysses-style alternative: all-gather the full j-side once, then one
    local rectangular sweep.  O(N) memory per chip — for small/medium N.

    For the masked pallas variants the gathered j-side is rolled so the
    chip's own shard comes FIRST: then local row==col index equality means
    'same body' and the square self-pair mask is exactly right for the
    whole rectangle."""
    pos_all = jax.lax.all_gather(pos_l, axis, tiled=True)
    mass_all = jax.lax.all_gather(mass_l, axis, tiled=True)
    if _RECT_VARIANTS.get(impl) in ("mxu", "fast", "turbo"):
        shift = jax.lax.axis_index(axis) * pos_l.shape[0]
        pos_all = jnp.roll(pos_all, -shift, axis=0)
        mass_all = jnp.roll(mass_all, -shift, axis=0)
        return _local_rect_forces(pos_l, pos_all, mass_all, cfg, impl,
                                  self_tile=True)
    return _local_rect_forces(pos_l, pos_all, mass_all, cfg, impl,
                              self_tile=False)


def _local_force_fn(impl: str, comm: str):
    """Pick the per-shard force sweep for a (impl, comm) pair — the ONE
    routing rule every sharded surface (step loop, frame loop, KDK
    priming) shares."""
    if comm == "rdma":
        from .rdma_ring import rdma_forces_local
        return rdma_forces_local
    if comm == "rdma_overlap":
        import functools as _ft

        from .rdma_ring import rdma_forces_local
        return _ft.partial(rdma_forces_local, overlap=True)
    if comm == "ring" and impl in _SYM_VARIANTS:
        return ring_forces_local_sym
    if comm == "ring":
        return ring_forces_local
    return allgather_forces_local


def _one_step_local(mass_l, cfg: SimConfig, impl: str, comm: str,
                    axis: str):
    """Build the per-shard single-step update ``(pos, vel, acc) ->
    (pos, vel, acc)`` for the configured comm tier + integrator — shared
    by the plain run loop and the in-loop frame loop."""
    force = _local_force_fn(impl, comm)

    weights = KDK_WEIGHTS.get(cfg.integrator)
    if weights is not None:
        # KDK-composed schemes (kdk/yoshida4), same as ops.step.step: the
        # first half-kick uses the acceleration carried in state.acc
        # (callers must prime it with a(x_0); Simulation.__init__ does via
        # prime_kdk).  The sub-step loop unrolls at trace time.
        def one_step(carry):
            pos, vel, acc = carry
            for w in weights:
                wdt = w * cfg.dt
                vel_half = kdk_kick(vel, acc, wdt)
                pos = kdk_drift(pos, vel_half, wdt)
                acc = force(pos, mass_l, cfg, impl, axis)
                vel = kdk_kick(vel_half, acc, wdt)
            return pos, vel, acc
    elif cfg.integrator == "reference":
        def one_step(carry):
            pos, vel, acc = carry
            new_acc = force(pos, mass_l, cfg, impl, axis)
            new_pos, new_vel = reference_update(pos, vel, new_acc, cfg.dt)
            return new_pos, new_vel, new_acc
    else:
        raise ValueError(f"unknown integrator {cfg.integrator!r}")
    return one_step


def _sharded_run_local(pos_l, vel_l, acc_l, mass_l, *, cfg: SimConfig,
                       n_steps: int, impl: str, comm: str, axis: str):
    one_step = _one_step_local(mass_l, cfg, impl, comm, axis)
    pos, vel, acc = jax.lax.fori_loop(
        0, n_steps, lambda _, c: one_step(c), (pos_l, vel_l, acc_l))
    return pos, vel, acc


def shard_padding(cfg: SimConfig, n_devices: int) -> int:
    """Padded N: divisible by P and, per shard, by the force-block sizes."""
    per_shard_multiple = max(cfg.block_i, cfg.block_j, 8)
    return round_up(cfg.n_bodies, n_devices * per_shard_multiple)


def run_steps_sharded(state: SimState, cfg: SimConfig, mesh: Mesh,
                      n_steps: int, impl: Optional[str] = None,
                      comm: str = "ring", axis: str = SHARD_AXIS) -> SimState:
    """Run n_steps of the sharded simulation on a 1-D mesh.

    State is padded with zero-mass ghosts to a shard-able size, sharded over
    the mesh, advanced entirely on-device, and unpadded on return (still
    sharded; pull with np.asarray when needed).
    """
    if comm not in ("ring", "allgather", "rdma", "rdma_overlap"):
        raise ValueError(
            f"comm must be 'ring', 'allgather', 'rdma', or "
            f"'rdma_overlap', got {comm!r}")
    local_impl = _resolve_local_impl(impl, sym_default=comm.startswith("rdma"))
    if comm.startswith("rdma"):
        # v2 accepts the full sym ladder (cross-chip N3L) and the
        # one-sided exact/turbo family; an EXPLICIT other impl fails
        # loudly here rather than silently swapping accuracy class
        # (None/'auto' resolves to the sym2 exact tier above).
        from .rdma_ring import _RDMA_ONE_SIDED
        if (local_impl not in _SYM_VARIANTS
                and local_impl not in _RDMA_ONE_SIDED):
            raise ValueError(
                f"comm='rdma' supports the pallas_sym* ladder and the "
                f"one-sided {sorted(_RDMA_ONE_SIDED)} family, got "
                f"{local_impl!r}")
    n_real = state.n
    p = mesh.shape[axis]
    state = pad_state_to(state, shard_padding(cfg, p))

    sharded = _sharded_run_program(mesh, axis, cfg, n_steps, local_impl,
                                   comm)
    pos, vel, acc = sharded(state.pos, state.vel, state.acc, state.mass)
    out = SimState(pos=pos, vel=vel, acc=acc, mass=state.mass)
    return unpad_state(out, n_real)


@functools.lru_cache(maxsize=32)
def _sharded_run_program(mesh: Mesh, axis: str, cfg: SimConfig,
                         n_steps: int, impl: str, comm: str):
    """Compile-once jitted shard_map chunk program.  Cached: the run
    loop calls per CHUNK, and a fresh ``jax.jit`` wrapper per call would
    retrace (and re-pay relay-side executable loading) at every chunk
    boundary (review r4 — same rationale as multiprog._mesh_programs)."""
    fn = functools.partial(
        _sharded_run_local, cfg=cfg, n_steps=n_steps, impl=impl,
        comm=comm, axis=axis)
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            # pallas_call's out_shape carries no varying-mesh-axes
            # annotation; skip the vma check rather than threading vma
            # through every kernel out_shape.
            check_vma=False,
        ))


def prime_kdk_sharded(state: SimState, cfg: SimConfig, mesh: Mesh,
                      impl: Optional[str] = None, comm: str = "ring",
                      progress=None, axis: str = SHARD_AXIS) -> SimState:
    """Seed ``state.acc = a(x_0)`` ON THE MESH — the sharded analog of
    ``ops.step.prime_kdk``, which is mesh-unaware: priming a sharded run
    through the single-device dispatcher gathers the (born-sharded) state
    onto one chip and runs a full single-chip N² eval — at flat-mode N
    that is exactly the (N,3) wall / over-long program the mesh design
    exists to avoid (review r4).  Routes through the bounded mesh
    dispatcher when one per-chip priming eval would exceed the program
    cap, mirroring ``Simulation._run_chunk``'s step routing."""
    from ..ops.step import should_use_multiprog
    p = mesh.shape[axis]
    local_impl = _resolve_local_impl(impl, sym_default=comm.startswith("rdma"))
    if (comm == "ring" and local_impl in _SYM_VARIANTS
            and should_use_multiprog(cfg, local_impl, n_devices=p)):
        from .multiprog import prime_kdk_sharded_multiprog
        return prime_kdk_sharded_multiprog(
            state, cfg, mesh, impl=local_impl, progress=progress, axis=axis)
    n_real = state.n
    state = pad_state_to(state, shard_padding(cfg, p))

    def prime_local(pos_l, mass_l):
        return _local_force_fn(local_impl, comm)(
            pos_l, mass_l, cfg, local_impl, axis)

    sharded = jax.jit(
        jax.shard_map(
            prime_local, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=P(axis), check_vma=False))
    acc = sharded(state.pos, state.mass)
    return unpad_state(state._replace(acc=acc), n_real)


def _sharded_frames_local(pos_l, vel_l, acc_l, mass_l, view_arr, *,
                          cfg: SimConfig, n_steps: int, frame_every: int,
                          impl: str, comm: str, axis: str):
    """Per-shard run loop with in-loop rendered frames: each chip
    rasterizes its LOCAL shard to a packed (H, W) weight map inside the
    compiled loop and the maps max-combine across the mesh (``pmax`` —
    the same brightest-point splat rule the rasterizer uses per pixel,
    so the combined frame is pixel-identical to rendering the gathered
    state).  Zero-mass ghosts never draw, so padding is invisible.

    ``view_arr``: (3,) f32 camera ``(max_view, cu, cv)`` — a TRACED
    operand like the single-chip path's, so live-viewer zoom/pan changes
    recompile nothing (review r4: it was a trace-baked static)."""
    from ..viz.raster import render_weights
    one_step = _one_step_local(mass_l, cfg, impl, comm, axis)
    mv, cu, cv = view_arr[0], view_arr[1], view_arr[2]

    def outer(carry, _):
        carry = jax.lax.fori_loop(
            0, frame_every, lambda _, c: one_step(c), carry)
        pos, _, _ = carry
        w8 = render_weights(pos, mass_l, cfg.min_mass, cfg.max_mass, mv,
                            cfg.viz_width, cfg.viz_height, 2, cu, cv)
        # uint8 rides the collective as int32 (max-combine; cast back).
        w8 = jax.lax.pmax(w8.astype(jnp.int32), axis).astype(jnp.uint8)
        return carry, w8

    n_frames = n_steps // frame_every
    carry, frames = jax.lax.scan(
        outer, (pos_l, vel_l, acc_l), None, length=n_frames)
    rem = n_steps - n_frames * frame_every
    if rem:
        carry = jax.lax.fori_loop(
            0, rem, lambda _, c: one_step(c), carry)
    pos, vel, acc = carry
    return pos, vel, acc, frames


def run_trajectory_frames_sharded(
        state: SimState, cfg: SimConfig, mesh: Mesh, n_steps: int,
        frame_every: int = 1, impl: Optional[str] = None,
        comm: str = "ring", view: "tuple | None" = None,
        axis: str = SHARD_AXIS):
    """``ops.step.run_trajectory_frames`` on a mesh (VERDICT r3 #6): the
    whole chunk — ring sweeps, integration, AND rasterization — runs
    inside one ``jit(shard_map(...))`` program; frames batch through the
    device->host link in one transfer per chunk exactly like the
    single-chip path (the per-frame round-trip, not the rasterizer, was
    the 7 fps bottleneck through the relay).

    Returns ``(final SimState, frames (F, H, W) uint8 packed weight
    maps)`` — feed ``viz.raster.colorize`` for RGB.
    """
    n_real = state.n
    p = mesh.shape[axis]
    state = pad_state_to(state, shard_padding(cfg, p))
    local_impl = _resolve_local_impl(impl, sym_default=comm.startswith("rdma"))
    mv, cu, cv = view if view is not None else (cfg.max_view, 0.0, 0.0)

    sharded = _sharded_frames_program(mesh, axis, cfg, n_steps,
                                      frame_every, local_impl, comm)
    view_arr = jnp.asarray([mv, cu, cv], jnp.float32)
    pos, vel, acc, frames = sharded(state.pos, state.vel, state.acc,
                                    state.mass, view_arr)
    out = SimState(pos=pos, vel=vel, acc=acc, mass=state.mass)
    return unpad_state(out, n_real), frames


def render_weights_sharded(state: SimState, cfg: SimConfig, mesh: Mesh,
                           view: "tuple | None" = None,
                           axis: str = SHARD_AXIS):
    """One packed (H, W) uint8 weight-map render of a SHARDED state as a
    standalone O(N) device program: each chip rasterizes its local shard,
    maps max-combine across the mesh (``pmax`` — the rasterizer's own
    brightest-point rule, so pixels are identical to rendering the
    gathered state, and zero-mass ghost padding never draws).

    This is the mesh-multiprog in-loop viz primitive (VERDICT r4
    missing #1): a frame render is trivially cheap next to an O(N²)
    step, so bounded-program runs dispatch it as its OWN program at the
    viz cadence instead of gathering state to one chip or fusing a
    render into a chunk.  The camera rides as a traced (3,) operand."""
    p = mesh.shape[axis]
    state = pad_state_to(state, shard_padding(cfg, p))
    mv, cu, cv = view if view is not None else (cfg.max_view, 0.0, 0.0)
    prog = _sharded_render_program(mesh, axis, cfg)
    return prog(state.pos, state.mass,
                jnp.asarray([mv, cu, cv], jnp.float32))


@functools.lru_cache(maxsize=32)
def _sharded_render_program(mesh: Mesh, axis: str, cfg: SimConfig):
    from ..viz.raster import render_weights

    def local(pos_l, mass_l, view_arr):
        w8 = render_weights(pos_l, mass_l, cfg.min_mass, cfg.max_mass,
                            view_arr[0], cfg.viz_width, cfg.viz_height,
                            2, view_arr[1], view_arr[2])
        return jax.lax.pmax(w8.astype(jnp.int32), axis).astype(jnp.uint8)

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P(axis), P(axis), P()),
            out_specs=P(), check_vma=False))


@functools.lru_cache(maxsize=32)
def _sharded_frames_program(mesh: Mesh, axis: str, cfg: SimConfig,
                            n_steps: int, frame_every: int, impl: str,
                            comm: str):
    """Compile-once jitted shard_map frames program (cached for the same
    per-chunk reasons as ``_sharded_run_program``; the camera rides as a
    traced (3,) operand so it is NOT part of the key)."""
    fn = functools.partial(
        _sharded_frames_local, cfg=cfg, n_steps=n_steps,
        frame_every=frame_every, impl=impl, comm=comm, axis=axis)
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            # frames are replicated after the pmax combine.
            out_specs=(P(axis), P(axis), P(axis), P()),
            check_vma=False,
        ))
