"""Device-trace breakdown of the GLOBAL-POSITIONING LM step at config-4
shape (VERDICT r5 #4: GP is 53% of warm e2e at 2k images and was never
device-traced).  Builds a synthetic GP problem (PC=3 camera centers +
points + per-observation scales, lane-major layout auto-on) matching the
2k pipeline shape, then traces N steps.

Usage: python tools/trace_gp_step.py [steps]
Env: GP_CAMS (2000), GP_TRACKS (350000), GP_OBS_PER_TRACK (23),
     GP_PCG (pipeline default 100).
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import LMConfig, LMState, lm_step
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.block_lm import Observations, Params
    from instantsfm_tpu.solve.problems import make_gp_problem

    C = int(os.environ.get("GP_CAMS", "2000"))
    T = int(os.environ.get("GP_TRACKS", "350000"))
    opt = int(os.environ.get("GP_OBS_PER_TRACK", "23"))
    pcg = int(os.environ.get("GP_PCG", "100"))
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    O = T * opt
    pt_idx = np.repeat(np.arange(T, dtype=np.int32), opt)
    cam_idx = rng.integers(0, C, O).astype(np.int32)
    t_obs = rng.standard_normal((O, 3)).astype(np.float32)
    t_obs /= np.linalg.norm(t_obs, axis=-1, keepdims=True)

    problem = make_gp_problem()
    params = Params(
        cam={"c": jnp.asarray(rng.uniform(-1, 1, (C, 3)), dtype)},
        pts=jnp.asarray(rng.uniform(-1, 1, (T, 3)), dtype),
        scales=jnp.ones((O, 1), dtype),
        scales_free=jnp.ones(O, bool))
    obs = Observations(
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        data={"tx": jnp.asarray(t_obs[:, 0]), "ty": jnp.asarray(t_obs[:, 1]),
              "tz": jnp.asarray(t_obs[:, 2]),
              "w": jnp.ones(O, dtype)},
        valid=jnp.ones(O, bool))
    cfg = LMConfig(pcg_iters=pcg, radius_init=1e3, radius_max=1e8)
    kernel = robust.huber(0.1)

    t0 = time.time()
    params, obs, buckets, _ = bucketize_problem(params, obs, track_pad=256)
    print(f"bucketize: {time.time()-t0:.1f}s; padded O = "
          f"{obs.valid.shape[0]:,}", file=sys.stderr)
    step = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o,
                                        buckets=buckets))
    state = LMState(params, jnp.asarray(1e-3, dtype), jnp.asarray(jnp.inf))
    t0 = time.time()
    state = step(state, obs)
    float(state.cost)
    print(f"first step (compile): {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(N):
        state = step(state, obs)
    float(state.cost)
    warm = (time.time() - t0) / N
    print(f"warm step: {warm:.2f}s", file=sys.stderr)

    tdir = "/tmp/gp_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(N):
            state = step(state, obs)
        float(state.cost)

    # aggregate device self-times from the trace protos
    evs = defaultdict(float)
    cnt = defaultdict(int)
    for path in glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            if "args" in ev and ev["args"].get("device_type"):
                pass
            dur = ev.get("dur", 0) / 1e3
            if dur <= 0:
                continue
            evs[name] += dur
            cnt[name] += 1
    total = 0.0
    rows = sorted(evs.items(), key=lambda kv: -kv[1])
    print(f"{'op':<55}{'ms/step':>9}{'count':>7}")
    for name, ms in rows[:30]:
        print(f"{name[:54]:<55}{ms / N:>9.3f}{cnt[name]:>7}")


if __name__ == "__main__":
    main()
