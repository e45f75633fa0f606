"""Runtime configuration for the TPU N-body framework.

Replaces the reference's compile-time ``#define`` flag system
(``TestProject/constants.h:1-26``) with a runtime dataclass: the reference's
four behavior flags (REDUCTION/FLOAT_3/FADL/BLOCK_64) become the runtime
``impl`` / precision choices, and its numeric tuning constants
(THREADS_PER_BLOCK, TILE_WIDTH_FACTOR, N_BODIES) become the Pallas block-size
knobs and ``n_bodies``.  Defaults match the reference's checked-in values:
DT=0.1, EPS2=0.002, N=8192, domain +/-1e5 per axis, mass in [1e5, 1e9]
(``constants.h:11-26``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

# Physics defaults — reference TestProject/constants.h:25-26
DEFAULT_DT = 0.1
DEFAULT_EPS2 = 0.002

# Domain / mass defaults — reference TestProject/constants.h:15-19
DEFAULT_MAX_POS = 100_000.0
DEFAULT_MIN_MASS = 100_000.0
DEFAULT_MAX_MASS = 1_000_000_000.0

# Workload default — reference TestProject/constants.h:13
DEFAULT_N_BODIES = 8192

# View box used by the visualizer — reference TestProject/constants.h:21-23
DEFAULT_MAX_VIEW = 200_000.0

_VALID_IMPLS = ("auto", "xla", "xla_nxn", "pallas", "pallas_kahan",
                "pallas_mxu", "pallas_fast", "pallas_turbo", "pallas_sym",
                "pallas_sym2", "pallas_sym_turbo", "pallas_sym_turbo2",
                "pallas_sym_mxu")
_VALID_INTEGRATORS = ("reference", "kdk", "yoshida4")


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Full runtime configuration of a simulation.

    Every knob the reference fixes at compile time is runtime-switchable here.
    """

    # Workload
    n_bodies: int = DEFAULT_N_BODIES
    steps: int = 100

    # Physics (reference constants.h:25-26)
    dt: float = DEFAULT_DT
    eps2: float = DEFAULT_EPS2

    # Initialization domain (reference constants.h:15-19, utils.cpp:30-37)
    max_pos: float = DEFAULT_MAX_POS
    min_mass: float = DEFAULT_MIN_MASS
    max_mass: float = DEFAULT_MAX_MASS
    seed: int = 0

    # Integration scheme. "reference" reproduces the reference's fused
    # half-kick + drift (kernel.cu:116-129) bit-for-bit in structure;
    # "kdk" is a textbook kick-drift-kick leapfrog offered as an upgrade;
    # "yoshida4" is a 4th-order symplectic composition of three KDK
    # sub-steps (3 force sweeps/step; models/integrators.py).
    integrator: str = "reference"

    # Force backend: "pallas" = VMEM-tiled kernel (analog of the reference's
    # shared-memory tiled kernel family, kernel.cu:80-130); "xla_nxn" =
    # interaction-parallel broadcast+reduce path (analog of the NxN
    # reduction family, kernel.cu:163-469); "xla" = chunked scan variant;
    # "pallas_mxu" = MXU-accelerated accumulation variant; "auto" picks by
    # backend and N.
    impl: str = "auto"

    # Precision of simulation state. fp32 matches the reference.
    dtype: str = "float32"

    # Pallas tuning (the analog of THREADS_PER_BLOCK / TILE_WIDTH_FACTOR).
    # 512x2048 measured fastest on v5e across variants (scripts/tune_blocks.py);
    # auto-shrinks for small N.
    block_i: int = 512
    block_j: int = 2048

    # Chunk size for the chunked-XLA force path.
    chunk: int = 1024

    # Pair-symmetric (N3L) kernel tuning: superblock width (the j-extent of
    # a tile AND the scatter-buffer granularity) and superblocks per panel
    # (None = sized automatically from the VMEM resident-buffer budget).
    # block_u=None auto-selects by N AND variant (the measured optima
    # differ — docs/PERF.md tile sweeps): exact family 1536 at N >= 512k /
    # 1024 below; turbo/turbo2 2048 from N >= 65536 / 1024 below
    # (ops/forces_pallas_sym.resolve_block_u).
    block_u: Optional[int] = None
    panel_nb: Optional[int] = None

    # Bounded program granularity (pallas_sym* impls): maximum interactions
    # per device program.  None = auto — fused single-program steps below
    # ~1.2e13 interactions/eval, multi-program dispatch above it (one fused
    # step past that point exceeds execution-time-limited runtimes: the
    # relay kills ~60 s programs, and a preemptible production scheduler
    # needs bounded units).  An explicit value forces multi-program
    # dispatch at that cap.
    prog_cap: Optional[float] = None

    # Visualization (reference simulation_visualization.h:8-9)
    viz: bool = False
    viz_width: int = 800
    viz_height: int = 600
    max_view: float = DEFAULT_MAX_VIEW
    viz_every: int = 1

    # Flat (3N,) state layout — the >16M-body mode.  None = auto: engages
    # for pallas_sym* impls on a single device above
    # ops.step.FLAT_AUTO_THRESHOLD bodies (where any device op consuming
    # an (N, 3) array tile-copies at 42.7x — docs/PERF.md memory walls).
    # True forces flat at any N (tests / validation); False forces the
    # regular (N, 3) layout and fails past the wall.
    flat_state: Optional[bool] = None

    # VMEM-resident multi-step mode (ops/resident.py): at small N the whole
    # state fits in VMEM, so K steps run inside ONE device program with zero
    # HBM state traffic between steps (measured 1.28x at N=4096, 1.10x at
    # the reference's own N=8192 design point and at 12288, 1.07x at
    # 16384, vs the best per-step path at equal steps-per-program —
    # scripts/r6_fair.py).  Serves all three integrators (reference /
    # kdk / yoshida4).
    # None = auto: engages for exact-tier impls in the measured-profitable
    # window — 2048 < N <= 16384 for the reference scheme, 3072 < N <=
    # 16384 for KDK-composed schemes (ops.resident.should_use_resident).
    # True forces it (errors when out of scope); False disables.
    resident: Optional[bool] = None

    # Multi-chip: number of mesh shards ("auto" = all local devices).
    shards: Optional[int] = None

    def __post_init__(self):
        if self.impl not in _VALID_IMPLS:
            raise ValueError(
                f"impl must be one of {_VALID_IMPLS}, got {self.impl!r}")
        if self.integrator not in _VALID_INTEGRATORS:
            raise ValueError(
                f"integrator must be one of {_VALID_INTEGRATORS}, "
                f"got {self.integrator!r}")
        if self.n_bodies <= 0:
            raise ValueError("n_bodies must be positive")
        if self.dtype not in ("float32", "float64", "bfloat16"):
            raise ValueError(f"unsupported dtype {self.dtype!r}")

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def interactions_per_step(self) -> int:
        """All-pairs interaction count per step (N^2), the unit of the
        GInteractions/s throughput metric (sweep defined by kernel.cu:99-114)."""
        return self.n_bodies * self.n_bodies

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
