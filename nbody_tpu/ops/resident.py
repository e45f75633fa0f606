"""VMEM-resident multi-step kernel: the whole simulation lives on-chip.

The reference's hot loop launches one kernel per step and keeps state in
GPU global memory between launches (``main.cpp:142-160``,
``kernel.cu:628-645``).  The repo's standard path already fuses the whole
run into one XLA program (``ops/step.py::run_steps``), but each step still
round-trips state through HBM and pays the per-step XLA epilogue
(pad/transpose/scatter-merge/descale/integrate as separate fused ops).
At large N those costs vanish into the O(N^2) sweep; at the reference's
own design point (N=8192, ``constants.h:13``) they are a measurable tax:
one step is ~0.2 ms of pair math at the vpu2 roofline but ~0.34 ms end
to end through the standard path (195 GInter/s vs a 339 SOL,
scripts/r6_fair.py).

This module removes them the TPU-native way: at small N the ENTIRE state
(positions, velocities, accelerations, masses — ~32 B/body in the
transposed (3, U)-per-superblock orientation) fits in the ~16 MB of VMEM,
so K steps run inside ONE ``pallas_call`` with state held in VMEM scratch
across grid steps.  Zero HBM traffic between steps; the only HBM I/O is
one state load at the start and one store at the end of the K-step chunk.

Design (mirrors the pair-symmetric production kernel,
``forces_pallas_sym.py``, with the same force-law contract
``d2 = |r|^2 + eps2; inv = rsqrt(d2^3)`` — ``kernel.cu:9-29``):

- Bodies pad to ``m = nb * U`` with zero-mass ghosts, ``nb`` ODD so the
  circular-offset sweep ``J = (I + 1 + dd) mod nb`` for
  ``dd = 0 .. (nb-3)/2`` visits every unordered off-diagonal superblock
  pair exactly once.
- Grid is ``(K, nb + 1)``, all-"arbitrary" (sequential on TPU).  Phases
  ``I < nb`` sweep superblock I: a one-sided vpu2-style diagonal tile
  (self-pairs vanish via r=0 under softening, ``kernel.cu:17-27``) plus
  the symmetric off-diagonal tiles, i-side accumulating into a per-phase
  ``(U, 3)`` scratch and j-side RMW-ing the resident ``(nb, 3, U)``
  accumulator at dynamic superblock offsets (the proven scatter pattern).
  Phase ``I == nb`` integrates every superblock in place (the reference's
  fused half-kick + drift, ``kernel.cu:116-124``) and re-zeroes the
  accumulator for the next step.
- The i-side needs body coordinates on SUBLANES while resident state is
  lane-oriented; since superblock I is the i-side only during its own
  phase, ONE in-kernel ``(4, U) -> (U, 4)`` transpose per phase (positions
  + mass column, fused) provides it — 2·nb small transposes per step
  instead of a 512 B/body block-oriented state copy (which would blow the
  VMEM budget above N~8k).
- Force math is the production exact tier ``vpu2``
  (``_pair_products_sym``: symmetric pair weight F = m_i·m_j·inv shared
  by both sides, 23 VPU flops/pair); the in-kernel 1/m descale maps
  zero-mass ghosts to zero acceleration so ghosts stay pinned at the
  origin across steps.

Accuracy: identical per-pair math to ``pallas_sym2``; only the
accumulation grouping differs (reassociation ulps) — same exact class,
oracle-gated in tests/test_resident.py.

Scope: the reference contract scheme AND the KDK-composed schemes (kdk,
yoshida4 — ``models/integrators.py``).  A KDK sub-step needs the force
evaluation mid-update, which costs the per-step path one full program
round-trip per sub-step (3/step for yoshida4); resident mode runs the
whole composition on a ``(K*S, nb+2)`` grid — pre-phase kick+drift on
the carried acceleration, sweep phases, post-phase descale + second
half-kick — with the sub-step weight selected from the static table by
``program_id mod S``.  Like ``run_steps``, the KDK path consumes
``state.acc`` as the seeded a(x_0) (``prime_kdk``).  Applicability is
VMEM-bound: ``resident_layout`` picks geometry by a fitted cost model
(padded pair work x block_i amortization x per-superblock phase
overhead) and returns None when nothing fits; past ~16k the feasible
block_i shrinks and the per-step path wins (the auto window ends
there), and callers fall back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.integrators import KDK_WEIGHTS
from ..models.state import SimState, pad_state_to
from .forces_pallas_sym import _pair_products_sym

# Slightly conservative VMEM ceiling for the ESTIMATE below (the real cap
# is ~16 MB/core; Mosaic is the final arbiter and raises on overflow).
# Calibrated on chip against the estimator: (7,1792,448) at N=12288
# (estimate 14.6 MB) compiles and is the measured-best layout there —
# a 13 MB budget wrongly rejected it — while (5,1664,832) at N=8192
# (estimate 18.7 MB) OOMs.
_RESIDENT_VMEM_BUDGET = 15 * 1024 * 1024

# Implementations the resident path can stand in for (it computes vpu2
# math; every exact-tier request routes here identically).
RESIDENT_IMPLS = ("pallas_sym2", "pallas_sym")

# Auto-routing crossover (measured at EQUAL steps-per-program and sync
# pattern, scripts/r6_fair.py on v5e, cost-model layouts): the resident
# kernel beats per-step sym2 178.3 vs 139.5 G/s at N=4096 (1.28x),
# 215.4 vs 195.8 at 8192 (1.10x), 242.5 vs 220.9 at 12288 (1.10x),
# 254.9 vs 237.9 at 16384 (1.07x); at the perfect-panel-fit 3072 it's
# parity (177.8 vs 176.8).  Above: at 20480/24576 the VMEM budget
# forces narrow block_i (240/192) and the standard path wins (252.4 vs
# 247.4 at 20480, 256.6 vs 244.2 at 24576).  Below: when the chosen
# layout degenerates to nb=1 (always true at N<=2048) the sweep is
# diagonal-only — no N3L halving, same flops as the one-sided kernel —
# and measures parity (119.8 vs 123.3 at 2048, 84.2 vs 81.2 at 1024),
# so auto stays off there.
RESIDENT_AUTO_MAX_N = 16384

# KDK-composed schemes open their window strictly ABOVE 3072: their
# standard path fuses S sub-steps per program (rent amortized S-fold),
# and at the perfect-panel-fit N=3072 it measures FASTER than resident
# (191.2 vs 175.4 G/s yoshida4 — scripts/r6_fair.py recheck); above,
# resident wins like the reference scheme (yoshida4: 1.22-1.23x at
# 4096, 1.07-1.10x at 8192, 1.04x at 12288, 1.07x at 16384).
RESIDENT_AUTO_KDK_MIN_N = 3072


def should_use_resident(cfg, impl: str) -> bool:
    """Decide resident routing for this run (the small-N analog of
    ``step.should_use_flat``/``should_use_multiprog``).

    ``cfg.resident`` wins: False disables; True forces and raises when the
    configuration is out of scope (wrong integrator/dtype/impl, or no
    VMEM-feasible layout).  None = auto: engage when every scope condition
    holds AND N is at or below the measured crossover."""
    if cfg.resident is False:
        return False
    forced = cfg.resident is True
    reasons = []
    if cfg.integrator != "reference" and cfg.integrator not in KDK_WEIGHTS:
        reasons.append(f"integrator={cfg.integrator!r} (needs 'reference' "
                       "or a KDK-composed scheme)")
    if cfg.dtype != "float32":
        reasons.append(f"dtype={cfg.dtype!r} (kernel is float32-only)")
    if impl not in RESIDENT_IMPLS:
        reasons.append(f"impl={impl!r} (exact sym tiers only)")
    lay = None
    if not reasons:
        lay = resident_layout(cfg.n_bodies)
        if lay is None:
            reasons.append(f"no VMEM-feasible layout at N={cfg.n_bodies}")
    if reasons:
        if forced:
            raise ValueError(
                "resident=True but the VMEM-resident mode is out of scope: "
                + "; ".join(reasons))
        return False
    # Auto: profitable only inside the measured window — the layout must
    # give a symmetric sweep (nb >= 3; nb=1 is diagonal-only, measured
    # parity with the one-sided kernel) and N at or below the crossover;
    # KDK-composed schemes additionally need N above their own floor.
    if forced:
        return True
    if cfg.integrator in KDK_WEIGHTS \
            and cfg.n_bodies <= RESIDENT_AUTO_KDK_MIN_N:
        return False
    return lay[0] >= 3 and cfg.n_bodies <= RESIDENT_AUTO_MAX_N


def _layout_vmem_bytes(nb, block_u, block_i, m):
    """Physical-VMEM estimate for one resident program.

    Scratch: posT/velT/accT (nb,3,U) pad sublanes 3->8; massT/winvT
    (nb,1,U) pad 1->8; accb (U,3) and posbI (U,4) pad lanes ->128.
    Streams: 4 inputs + 3 outputs at (8, m) physical (the KDK kernel's
    acc input counted for both — layouts are insensitive to it at every
    measured N).  Tile live set: with the si sub-loops SERIALIZED
    (lax.fori_loop) Mosaic's scoped stack holds ~2.5 (BI, U) f32
    temporaries — CALIBRATED on chip: (5,1664,416) at N=8192 compiles
    (a coefficient of 6 wrongly rejected it, costing the measured-best
    layout) while (5,1664,832) OOMs, bracketing the coefficient in
    (2.0, 2.9) against the 13 MB budget.  A statically unrolled sweep
    multiplies the live set by sub instead — measured 48.6 MB at
    8k/sub=4, compile-time OOM."""
    t_state = 3 * nb * 8 * block_u * 4
    mass_rows = 2 * nb * 8 * block_u * 4
    blocked = 2 * block_u * 128 * 4            # accb + posbI
    streams = 7 * 8 * m * 4
    live = 2.5 * block_i * block_u * 4
    return t_state + mass_rows + blocked + streams + live


def _layout_cost(nb, block_i, m):
    """Fitted per-step cost model (lower is better), v5e measurements
    (scripts/r6_resident_lay.py):

    - pair work scales with m^2 (ghost pairs cost the same as real);
    - sub-tile overheads amortize with block_i as (1 + 9/BI) — fitted on
      the same-session BI ladder at (5,1664): 64/104/208/416 -> 178.5/
      186.0/195.7/198.9 G/s;
    - each superblock adds ~1.3%/step of phase overhead (transpose,
      scatter RMW, loop bookkeeping) — fitted on same-m pairs
      (11,384) vs (3,1408) at 4096 (142.8 vs 167.3), (13,640) vs
      (5,1664) at 8192 (172.5 vs 199), (43,384) vs (13,1280) at 16384
      (182.6 vs 242.8).  This term is what the old min-padding objective
      missed: at 16384 it picked nb=43 (182.6 G/s) over the nb=13 layout
      that measures 242.8."""
    return m * m * (1.0 + 9.0 / block_i) * (1.0 + 0.013 * nb)


def resident_layout(n: int):
    """Choose ``(nb, block_u, block_i)`` for a resident run of n bodies, or
    None when no geometry fits the VMEM budget.

    Minimizes the fitted cost model ``_layout_cost`` (padded pair work x
    sub-tile amortization x per-superblock phase overhead) over all
    VMEM-feasible geometries, preferring wider tiles on near-ties.
    Chosen layouts reproduce the measured-best geometry at every swept N
    (3072/4096/8192/16384 — docs/PERF.md round 6)."""
    if n < 1:
        return None
    best = None
    for block_u in range(256, 2048 + 1, 128):
        nb = -(-n // block_u)
        if nb % 2 == 0:
            nb += 1
        m = nb * block_u
        for block_i in range(min(512, block_u), 0, -8):
            if block_u % block_i:
                continue
            if _layout_vmem_bytes(nb, block_u, block_i, m) > \
                    _RESIDENT_VMEM_BUDGET:
                continue
            # Largest feasible block_i for this block_u; the BI term is
            # monotone so no smaller BI can score better at the same U.
            key = (_layout_cost(nb, block_i, m), -block_u)
            if best is None or key < best[0]:
                best = (key, (nb, block_u, block_i))
            break
    return None if best is None else best[1]


def _diag_tile_vpu2(xi, mcol, xjT, mrow, eps2):
    """One-sided mass-scaled diagonal tile: every ordered pair within the
    superblock once (self-pairs contribute 0 via r=0), raw sums carry the
    receiving body's mass like every vpu2 tile."""
    dx = xjT[0:1, :] - xi[:, 0:1]
    dy = xjT[1:2, :] - xi[:, 1:2]
    dz = xjT[2:3, :] - xi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    f = (mcol * mrow) * jax.lax.rsqrt(d2 * d2 * d2)
    return jnp.concatenate(
        [jnp.sum(f * dx, axis=1, keepdims=True),
         jnp.sum(f * dy, axis=1, keepdims=True),
         jnp.sum(f * dz, axis=1, keepdims=True)], axis=1)   # (BI, 3)


def _load_resident_state(nb, block_u, posT_in, velT_in, mass_in,
                         posT_s, velT_s, massT_s, winvT_s):
    """First-phase load: stage the whole padded state into VMEM scratch
    (superblock-sliced) and precompute the 1/m descale rows (ghosts -> 0)."""
    for s in range(nb):
        sl = slice(s * block_u, (s + 1) * block_u)
        posT_s[s] = posT_in[:, sl]
        velT_s[s] = velT_in[:, sl]
        mrow = mass_in[:, sl]
        massT_s[s] = mrow
        winvT_s[s] = jnp.where(mrow > 0, 1.0 / mrow, 0.0)


def _sweep_superblock(I, eps2, nb, du, sub, block_i,
                      posT_s, massT_s, accT_s, accb_s, posbI_s):
    """One sweep phase: superblock I's diagonal tile plus its half of the
    circular off-diagonal sweep, i-side into ``accb_s``, j-side RMW into
    the resident accumulator.  Shared verbatim by the reference-scheme and
    KDK-composed kernels (identical pair math = identical exact tier)."""
    own = (pl.ds(I, 1), slice(None), slice(None))
    xjT_own = posT_s[own][0]                     # (3, U)
    mrow_own = massT_s[own][0]                   # (1, U)
    # The phase's i-side operand: positions + mass of superblock I
    # on SUBLANES, via one fused (4, U) -> (U, 4) transpose, staged
    # in a VMEM scratch ref: Mosaic's compiled lowering has no
    # dynamic_slice on VALUES inside fori_loop (only pl.ds ref
    # indexing — the proven dynamic-offset scatter pattern).
    pm4 = jnp.concatenate([xjT_own, mrow_own], axis=0)
    posbI_s[...] = jnp.transpose(pm4, (1, 0))    # (U, 4)

    def _xi(si):
        return posbI_s[pl.ds(si * block_i, block_i), :]

    # Sub-block loops run as lax.fori_loop: a statically unrolled
    # si sweep keeps EVERY iteration's (BI, U) temporaries live on
    # Mosaic's scoped-VMEM stack (measured 48.6 MB at 8k with
    # sub=4 — compile-time OOM); serializing bounds the stack to
    # one iteration's live set.
    def diag_si(si, _):
        xi = _xi(si)
        accb_s[pl.ds(si * block_i, block_i), :] = _diag_tile_vpu2(
            xi[:, 0:3], xi[:, 3:4], xjT_own, mrow_own, eps2)
        return 0
    jax.lax.fori_loop(0, sub, diag_si, 0)

    if du > 0:
        def dd_body(dd, _):
            J = jax.lax.rem(I + 1 + dd, jnp.int32(nb))
            slj = (pl.ds(J, 1), slice(None), slice(None))
            xjT = posT_s[slj][0]
            mrow = massT_s[slj][0]

            def od_si(si, _):
                xi = _xi(si)
                ai, aj = _pair_products_sym(
                    xi[:, 0:3], xjT, mrow, xi[:, 3:4], eps2)
                row = pl.ds(si * block_i, block_i)
                accb_s[row, :] += ai
                accT_s[slj] = accT_s[slj] - aj[None]
                return 0
            jax.lax.fori_loop(0, sub, od_si, 0)
            return 0
        jax.lax.fori_loop(0, du, dd_body, 0)

    # Fold the phase's i-side sums into the lane-oriented
    # accumulator: one (U, 3) -> (3, U) transpose per phase.
    sli = (pl.ds(I, 1), slice(None), slice(None))
    accT_s[sli] = accT_s[sli] + jnp.transpose(accb_s[:], (1, 0))[None]


@functools.lru_cache(maxsize=None)
def _make_resident_kernel(eps2, dt, nb, sub, block_i, block_u, n_steps):
    du = (nb - 1) // 2

    def kernel(posT_in, velT_in, mass_in,
               posT_out, velT_out, accT_out,
               posT_s, velT_s, accT_s, massT_s, winvT_s, accb_s, posbI_s):
        k = pl.program_id(0)
        phase = pl.program_id(1)

        @pl.when(jnp.logical_and(k == 0, phase == 0))
        def _init():
            _load_resident_state(nb, block_u, posT_in, velT_in, mass_in,
                                 posT_s, velT_s, massT_s, winvT_s)
            accT_s[...] = jnp.zeros_like(accT_s)

        @pl.when(phase < nb)
        def _sweep():
            _sweep_superblock(phase, eps2, nb, du, sub, block_i,
                              posT_s, massT_s, accT_s, accb_s, posbI_s)

        @pl.when(phase == nb)
        def _integrate():
            last = k == n_steps - 1
            for s in range(nb):
                a = accT_s[s] * winvT_s[s]       # 1/m descale; ghosts -> 0
                v = velT_s[s] + (0.5 * dt) * a   # half kick (kernel.cu:117)
                p = posT_s[s] + dt * v           # drift    (kernel.cu:121)
                velT_s[s] = v
                posT_s[s] = p
                accT_s[s] = jnp.zeros_like(a)    # next step's accumulator

                @pl.when(last)
                def _(s=s, a=a, v=v, p=p):
                    sl = slice(s * block_u, (s + 1) * block_u)
                    posT_out[:, sl] = p
                    velT_out[:, sl] = v
                    accT_out[:, sl] = a

    return kernel


@functools.lru_cache(maxsize=None)
def _make_resident_kernel_kdk(eps2, dt, weights, nb, sub, block_i, block_u,
                              n_steps):
    """KDK-composed resident kernel: grid ``(n_steps * S, nb + 2)``.

    Each outer grid step is ONE sub-step of weight ``weights[k mod S]``
    (``models/integrators.py::KDK_WEIGHTS`` — kdk S=1, yoshida4 S=3):
    phase 0 half-kicks on the carried DESCALED acceleration and drifts,
    then zeroes the accumulator; phases 1..nb sweep (raw mass-weighted
    sums, identical to the reference kernel); phase nb+1 descales and
    applies the second half-kick, leaving ``accT_s`` descaled for the
    next sub-step's phase 0 (and for the output on the last sub-step).
    The ordering mirrors ``ops/step.py::step``'s KDK branch exactly."""
    du = (nb - 1) // 2
    S = len(weights)

    def kernel(posT_in, velT_in, accT_in, mass_in,
               posT_out, velT_out, accT_out,
               posT_s, velT_s, accT_s, massT_s, winvT_s, accb_s, posbI_s):
        k = pl.program_id(0)
        phase = pl.program_id(1)
        # Static-table weight select: S <= 3, a where-chain is cheapest.
        wdt = jnp.float32(weights[0] * dt)
        if S > 1:
            subi = jax.lax.rem(k, jnp.int32(S))
            for j in range(1, S):
                wdt = jnp.where(subi == j, jnp.float32(weights[j] * dt),
                                wdt)

        @pl.when(phase == 0)
        def _pre():
            @pl.when(k == 0)
            def _init():
                _load_resident_state(nb, block_u, posT_in, velT_in, mass_in,
                                     posT_s, velT_s, massT_s, winvT_s)
                for s in range(nb):
                    sl = slice(s * block_u, (s + 1) * block_u)
                    accT_s[s] = accT_in[:, sl]   # seeded a(x_0), descaled

            # First half-kick on the carried acceleration, then drift
            # (kdk_kick + kdk_drift, ops/step.py:109-111); ghosts carry
            # a=0, v=0 and stay pinned.
            for s in range(nb):
                v = velT_s[s] + (0.5 * wdt) * accT_s[s]
                posT_s[s] = posT_s[s] + wdt * v
                velT_s[s] = v
                accT_s[s] = jnp.zeros_like(accT_s[s])  # raw-sum accumulator

        @pl.when(jnp.logical_and(phase > 0, phase <= nb))
        def _sweep():
            _sweep_superblock(phase - 1, eps2, nb, du, sub, block_i,
                              posT_s, massT_s, accT_s, accb_s, posbI_s)

        @pl.when(phase == nb + 1)
        def _post():
            last = k == S * n_steps - 1
            for s in range(nb):
                a = accT_s[s] * winvT_s[s]       # descale; ghosts -> 0
                v = velT_s[s] + (0.5 * wdt) * a  # second half-kick
                velT_s[s] = v
                accT_s[s] = a                    # carried descaled

                @pl.when(last)
                def _(s=s, a=a, v=v):
                    sl = slice(s * block_u, (s + 1) * block_u)
                    posT_out[:, sl] = posT_s[s]
                    velT_out[:, sl] = v
                    accT_out[:, sl] = a

    return kernel


@functools.partial(
    jax.jit, static_argnames=("eps2", "dt", "n_steps", "nb", "block_u",
                              "block_i", "interpret"))
def _run_resident_padded(posT, velT, mass_row, *, eps2, dt, n_steps, nb,
                         block_u, block_i, interpret):
    m = nb * block_u
    sub = block_u // block_i
    kernel = _make_resident_kernel(eps2, dt, nb, sub, block_i, block_u,
                                   n_steps)
    full3 = pl.BlockSpec((3, m), lambda k, ph: (0, 0),
                         memory_space=pltpu.VMEM)
    full1 = pl.BlockSpec((1, m), lambda k, ph: (0, 0),
                         memory_space=pltpu.VMEM)
    pairs_per_step = m * (m - 1) / 2 + m
    return pl.pallas_call(
        kernel,
        grid=(n_steps, nb + 1),
        in_specs=[full3, full3, full1],
        out_specs=[full3, full3, full3],
        out_shape=[jax.ShapeDtypeStruct((3, m), posT.dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((nb, 3, block_u), posT.dtype),   # posT_s
            pltpu.VMEM((nb, 3, block_u), posT.dtype),   # velT_s
            pltpu.VMEM((nb, 3, block_u), posT.dtype),   # accT_s
            pltpu.VMEM((nb, 1, block_u), posT.dtype),   # massT_s
            pltpu.VMEM((nb, 1, block_u), posT.dtype),   # winvT_s
            pltpu.VMEM((block_u, 3), posT.dtype),       # accb_s
            pltpu.VMEM((block_u, 4), posT.dtype),       # posbI_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(23 * n_steps * pairs_per_step),
            bytes_accessed=9 * 8 * m * 4,
            transcendentals=int(n_steps * pairs_per_step)),
        interpret=interpret,
    )(posT, velT, mass_row)


@functools.partial(
    jax.jit, static_argnames=("eps2", "dt", "weights", "n_steps", "nb",
                              "block_u", "block_i", "interpret"))
def _run_resident_padded_kdk(posT, velT, accT, mass_row, *, eps2, dt,
                             weights, n_steps, nb, block_u, block_i,
                             interpret):
    m = nb * block_u
    sub = block_u // block_i
    S = len(weights)
    kernel = _make_resident_kernel_kdk(eps2, dt, weights, nb, sub, block_i,
                                       block_u, n_steps)
    full3 = pl.BlockSpec((3, m), lambda k, ph: (0, 0),
                         memory_space=pltpu.VMEM)
    full1 = pl.BlockSpec((1, m), lambda k, ph: (0, 0),
                         memory_space=pltpu.VMEM)
    pairs_per_step = m * (m - 1) / 2 + m
    return pl.pallas_call(
        kernel,
        grid=(S * n_steps, nb + 2),
        in_specs=[full3, full3, full3, full1],
        out_specs=[full3, full3, full3],
        out_shape=[jax.ShapeDtypeStruct((3, m), posT.dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((nb, 3, block_u), posT.dtype),   # posT_s
            pltpu.VMEM((nb, 3, block_u), posT.dtype),   # velT_s
            pltpu.VMEM((nb, 3, block_u), posT.dtype),   # accT_s
            pltpu.VMEM((nb, 1, block_u), posT.dtype),   # massT_s
            pltpu.VMEM((nb, 1, block_u), posT.dtype),   # winvT_s
            pltpu.VMEM((block_u, 3), posT.dtype),       # accb_s
            pltpu.VMEM((block_u, 4), posT.dtype),       # posbI_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(23 * S * n_steps * pairs_per_step),
            bytes_accessed=10 * 8 * m * 4,
            transcendentals=int(S * n_steps * pairs_per_step)),
        interpret=interpret,
    )(posT, velT, accT, mass_row)


def run_steps_resident(state: SimState, cfg, n_steps: int,
                       interpret: "bool | None" = None,
                       layout: "tuple | None" = None) -> SimState:
    """Advance ``n_steps`` steps with the whole simulation resident in
    VMEM (one device program, zero HBM state traffic between steps).
    Drop-in for ``run_steps`` at small N — reference scheme and the
    KDK-composed schemes (kdk/yoshida4; like ``run_steps`` these consume
    ``state.acc`` as the seeded a(x_0), see ``prime_kdk``).  Raises
    ValueError when the configuration is out of scope (caller falls
    back)."""
    weights = KDK_WEIGHTS.get(cfg.integrator)
    if cfg.integrator != "reference" and weights is None:
        raise ValueError(
            "resident mode implements the reference integrator and the "
            f"KDK-composed schemes; got {cfg.integrator!r}")
    if n_steps < 1:
        return state
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lay = layout or resident_layout(state.n)
    if lay is None:
        raise ValueError(
            f"no resident layout fits N={state.n} in VMEM; use the "
            "standard path")
    nb, block_u, block_i = lay
    m = nb * block_u
    n_real = state.n
    padded = pad_state_to(state, m)
    posT = padded.pos.T
    velT = padded.vel.T
    mass_row = padded.mass[None, :]
    if cfg.integrator == "reference":
        posT, velT, accT = _run_resident_padded(
            posT, velT, mass_row, eps2=cfg.eps2, dt=cfg.dt,
            n_steps=n_steps, nb=nb, block_u=block_u, block_i=block_i,
            interpret=interpret)
    else:
        posT, velT, accT = _run_resident_padded_kdk(
            posT, velT, padded.acc.T, mass_row, eps2=cfg.eps2, dt=cfg.dt,
            weights=weights, n_steps=n_steps, nb=nb, block_u=block_u,
            block_i=block_i, interpret=interpret)
    return SimState(
        pos=posT.T[:n_real], vel=velT.T[:n_real], acc=accT.T[:n_real],
        mass=state.mass)
