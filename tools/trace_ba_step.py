"""Device-trace breakdown of the BA LM step (the PERF_NOTES methodology).

Runs N warmed steps of the bench problem under jax.profiler.trace and prints
per-op device self-time (total/N), top entries first.  Honors the same env
knobs as bench.py (ISFM_NO_PALLAS, ISFM_PALLAS_TILE, BENCH_BA_*).

Usage: python tools/trace_ba_step.py [steps]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_ba
    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import LMConfig, LMState, lm_step
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.pallas_schur import default_pallas_tile

    num_cams = int(os.environ.get("BENCH_BA_CAMS", "200"))
    num_pts = int(os.environ.get("BENCH_BA_PTS", "50000"))
    problem, params, obs = make_ba(num_cams, num_pts,
                                   int(os.environ.get("BENCH_BA_OBS_PER_PT",
                                                      "8")))
    cfg = LMConfig(pcg_iters=25, pcg_tol=1e-4, max_rejects=2)
    kernel = robust.huber(1.0)
    pallas_tile = default_pallas_tile()
    params, obs, buckets, _ = bucketize_problem(params, obs,
                                                span_align=pallas_tile)
    step = jax.jit(lambda s, o: lm_step(problem, kernel, cfg, s, o,
                                        buckets=buckets,
                                        pallas_tile=pallas_tile))
    def fresh_state():
        return LMState(params, jnp.asarray(1e-4, params.pts.dtype),
                       jnp.asarray(jnp.inf, params.pts.dtype))

    state = fresh_state()
    for _ in range(3):
        state = step(state, obs)
    float(state.cost)

    # trace ACTIVE convergence from a fresh start (matching bench.py's timed
    # region) — tracing at the converged fixed point would count the full
    # reject budget every step and early-exiting CG loops
    state = fresh_state()
    tdir = "/tmp/isfm_trace"
    os.system(f"rm -rf {tdir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        for _ in range(N):
            state = step(state, obs)
        float(state.cost)
    wall = (time.perf_counter() - t0) / N
    print(f"wall per step: {wall*1e3:.1f} ms  (pallas_tile={pallas_tile})")

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace output under {tdir}"
    ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    # device lanes: pid whose name mentions TPU / device
    pid_name = {e["pid"]: e["args"].get("name", "") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e}
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}
    # SELF time: subtract nested children (while-loop envelopes contain
    # their body ops) via an interval stack per device lane
    from collections import defaultdict as dd
    lanes = dd(list)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            lanes[(e["pid"], e.get("tid"))].append(e)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for lane_ev in lanes.values():
        lane_ev.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []
        for e in lane_ev:
            ts, dur = e["ts"], e.get("dur", 0.0)
            while stack and ts >= stack[-1][1]:
                stack.pop()
            if stack:
                tot[stack[-1][2]] -= dur     # remove child from parent
            tot[e["name"]] += dur
            cnt[e["name"]] += 1
            stack.append((ts, ts + dur, e["name"]))
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    total = sum(tot.values())
    print(f"{'op (self time)':<48} {'ms/step':>9} {'count':>6} {'share':>6}")
    for name, us in rows:
        print(f"{name[:48]:<48} {us/1e3/N:>9.3f} {cnt[name]:>6}"
              f" {us/total:>6.1%}")
    print(f"device total/step: {total/1e3/N:.1f} ms")


if __name__ == "__main__":
    main()
