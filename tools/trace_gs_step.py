"""Device-trace breakdown of the 3DGS training step (VERDICT r2 item 7 —
the PERF_NOTES methodology applied to the rasterizer path).

Usage: python tools/trace_gs_step.py [steps]
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
    import optax

    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from instantsfm_tpu.gs import (rasterize, splats as splats_mod,
                                   ssim as ssim_mod)

    G, W, H = 100_000, 800, 608
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (G, 3)) + np.array([0, 0, 6.0])
    cols = rng.uniform(0, 1, (G, 3))
    splats = splats_mod.init_splats(pts, cols, capacity=G, sh_degree=3)
    tx = splats_mod.make_optimizer(scene_scale=4.0)
    fparams = splats_mod.float_params(splats)
    opt_state = tx.init(fparams)
    viewmat = jnp.eye(4)
    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    alive = splats.alive

    def loss_fn(fp):
        sp = splats_mod.with_float_params(splats, fp)
        opac = jax.nn.sigmoid(sp.opacities) * alive
        out = rasterize.rasterize(
            sp.means, sp.quats, jnp.exp(sp.scales), opac,
            jnp.concatenate([sp.sh0, sp.shN], axis=1), viewmat, K,
            width=W, height=H, sh_degree=3, tile_capacity=512)
        l1 = jnp.mean(jnp.abs(out.rgb - target))
        s = ssim_mod.ssim(out.rgb, target)
        return 0.8 * l1 + 0.2 * (1 - s)

    @jax.jit
    def step(fp, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(fp)
        updates, opt_state = tx.update(grads, opt_state, fp)
        return optax.apply_updates(fp, updates), opt_state, loss

    for _ in range(3):
        fparams, opt_state, loss = step(fparams, opt_state)
    float(loss)

    tdir = "/tmp/isfm_gs_trace"
    os.system(f"rm -rf {tdir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        for _ in range(N):
            fparams, opt_state, loss = step(fparams, opt_state)
        float(loss)
    wall = (time.perf_counter() - t0) / N
    print(f"wall per step: {wall*1e3:.1f} ms")

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    pid_name = {e["pid"]: e["args"].get("name", "") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e}
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}
    lanes = defaultdict(list)
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
                tot[stack[-1][2]] -= dur
            tot[e["name"]] += dur
            cnt[e["name"]] += 1
            stack.append((ts, ts + dur, e["name"]))
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:35]
    total = sum(tot.values())
    print(f"{'op (self time)':<52} {'ms/step':>9} {'count':>6} {'share':>6}")
    for name, us in rows:
        print(f"{name[:52]:<52} {us/1e3/N:>9.3f} {cnt[name]:>6}"
              f" {us/total:>6.1%}")
    print(f"device total/step: {total/1e3/N:.1f} ms")


if __name__ == "__main__":
    main()
