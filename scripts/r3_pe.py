"""PE Pallas kernel: compiled accuracy spot vs host f64, and 1M timing vs
the XLA bounded path."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_pe.log", "a") as f:
        f.write(msg + "\n")

def main():
    import jax, jax.numpy as jnp
    from nbody_tpu import SimConfig, init_state
    from nbody_tpu.models.energy import energy_f64, total_energy_bounded
    from nbody_tpu.models.state import SimState
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")

    # Compiled accuracy spot at 8192 (forced pallas, forced bounded).
    cfg = SimConfig(n_bodies=8192, seed=5)
    st = init_state(cfg)
    exact = energy_f64(st, cfg.eps2)               # host f64 (n small)
    pal = total_energy_bounded(st, cfg.eps2, row_chunk=2048,
                               use_pallas=True)
    log(f"[pe acc 8192] exact {exact:.6e} pallas {pal:.6e} "
        f"rel {abs(pal-exact)/abs(exact):.2e}")

    # 1M timing: pallas vs XLA bounded.
    cfg = SimConfig(n_bodies=1 << 20, seed=6)
    st = init_state(cfg)
    for name, kw in [("pallas", dict(use_pallas=True)),
                     ("xla", dict(use_pallas=False))]:
        total_energy_bounded(st, cfg.eps2, **kw)   # warm/compile
        t0 = time.time()
        e = total_energy_bounded(st, cfg.eps2, **kw)
        dt = time.time() - t0
        log(f"[pe 1M {name}] {e:.6e} in {dt:.1f}s")
        with open("/root/repo/bench_results_r3.jsonl", "a") as f:
            f.write(json.dumps({"stage": "r3_pe", "n": 1 << 20,
                                "path": name, "energy": e,
                                "seconds": round(dt, 1)}) + "\n")
    log("DONE")
    return 0

if __name__ == "__main__":
    sys.exit(main())
