"""Config #5 refresh: fps at N=65536 with the round-3 auto tiles (turbo
now 512x2048 at 65k; was pinned 1024 in the round-2 harness)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(msg):
    print(msg, flush=True)
    with open("/tmp/r3_fps.log", "a") as f:
        f.write(msg + "\n")

def main():
    import jax
    from nbody_tpu import SimConfig
    from nbody_tpu.models.simulation import Simulation
    from nbody_tpu.viz.stream import FrameStreamer
    from nbody_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    try:
        cfg = SimConfig(n_bodies=65536, impl="pallas_sym_turbo",
                        viz_every=1)   # auto tiles
        sim = Simulation(cfg)
        out_dir = "/tmp/fps_frames_r3"
        with FrameStreamer(out_dir) as fs:
            sim.run(n_steps=120, log_every=0, frame_streamer=fs)  # warm
        with FrameStreamer(out_dir) as fs:
            t0 = time.perf_counter()
            sim.run(n_steps=120, log_every=0, frame_streamer=fs)
            wall_sim = time.perf_counter() - t0
        wall = time.perf_counter() - t0
        log(f"[fps r3] 120 frames; sim+transfer {wall_sim:.2f}s = "
            f"{120 / wall_sim:.1f} fps; incl. PNG drain {wall:.2f}s = "
            f"{120 / wall:.1f} fps")
        with open("/root/repo/bench_results_r3.jsonl", "a") as f:
            f.write(json.dumps({"stage": "r3_fps", "n": 65536,
                                "viz_every": 1, "frames": 120,
                                "fps_sim_transfer": round(120 / wall_sim, 1),
                                "fps_incl_png": round(120 / wall, 1)}) + "\n")
    except Exception:
        log(f"[fps r3] FAILED:\n{traceback.format_exc()[-400:]}")
    log("DONE")
    return 0

if __name__ == "__main__":
    sys.exit(main())
