"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip `shard_map` ring path is exercised without a TPU pod (SURVEY.md
section 4 'Implication for the rebuild').  Must run before jax is imported.

Collective-timing envelope (VERDICT r4 #1/#8)
---------------------------------------------
XLA's CPU collective runtime HARD-TERMINATES the whole process (SIGABRT,
``rendezvous.cc`` "Termination timeout") when any participant of a
collective arrives more than ~40 s after the first.  On a 1-core host all
8 virtual devices serialize, so a mesh test whose per-device work between
two collectives exceeds ~40/8 = 5 s of single-core compute can abort the
ENTIRE pytest run — this killed round 4's suite via an oversized dryrun
geometry (N=4096, kdk, 2 steps of interpret-mode Pallas per rendezvous).

Rules for new mesh tests:
- Keep executed geometry tiny: <= ~128 bodies/device for interpret-mode
  Pallas tiers, 1-2 steps.  Plan/arithmetic assertions may use any
  geometry — only EXECUTION counts against the envelope.
- Prefer many small bounded programs (each ends with its own rendezvous)
  over one fused program with long compute between ppermutes.
- The ``pytest_runtest_logreport`` hook below enforces a per-test wall
  budget as a lint: a test above TEST_BUDGET_S fails the session even if
  it passed, because it is one slow-host factor away from a process
  abort.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered a remote TPU
# backend and overwritten jax_platforms; force back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Per-test wall budget (seconds).  The slowest legitimate test today runs
# ~40 s on this 1-core box; 240 s leaves 6x headroom for slower hosts
# while still catching the minutes-long geometry that aborted round 4.
TEST_BUDGET_S = 240.0
_over_budget = []


def pytest_runtest_logreport(report):
    if report.when == "call" and report.duration > TEST_BUDGET_S:
        _over_budget.append((report.nodeid, report.duration))


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if _over_budget:
        terminalreporter.section("collective-timing envelope (conftest.py)")
        for nid, dur in _over_budget:
            terminalreporter.write_line(
                f"BUDGET EXCEEDED: {nid} took {dur:.0f}s "
                f"(> {TEST_BUDGET_S:.0f}s) — shrink its executed mesh "
                f"geometry before it SIGABRTs the suite on a slow host")


def pytest_sessionfinish(session, exitstatus):
    if _over_budget and session.exitstatus == 0:
        session.exitstatus = 1


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_small_system(n=256, seed=0, dtype=np.float32,
                      max_pos=100_000.0, min_mass=1e5, max_mass=1e9):
    """Small random system in the reference's init ranges (utils.cpp:30-37)."""
    r = np.random.default_rng(seed)
    pos = r.uniform(-max_pos, max_pos, size=(n, 3)).astype(dtype)
    mass = r.uniform(min_mass, max_mass, size=(n,)).astype(dtype)
    vel = np.zeros((n, 3), dtype=dtype)
    return pos, vel, mass
