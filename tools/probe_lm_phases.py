"""Phase bisection of the LM step at large scale (VERDICT r5 #4 follow-up:
GP 11.9 s/iter and BA 14.3 s/iter at the 2k config — which phase binds?).

Times, each as its own jitted function at the same bucketed layout:
  build   = build_system alone
  solve1  = build + one damped solve (solve cost = solve1 - build)
  loss    = one compute_loss_vec pass
  step    = full lm_step (includes the retry while_loop; step - solve1 -
            loss ~ extra retries + acceptance overhead)

Usage: python tools/probe_lm_phases.py [ba|gp]
Env: PH_CAMS (2000), PH_TRACKS (350000), PH_OBS_PER_TRACK (23), PH_PCG.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import (LMConfig, LMState,
                                               Observations, Params,
                                               build_system,
                                               compute_loss_vec, lm_step,
                                               solve_damped)
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.problems import (make_ba_problem,
                                               make_gp_problem)
    from instantsfm_tpu.scene import cameras as cm

    kind = (sys.argv[1] if len(sys.argv) > 1 else "gp").lower()
    C = int(os.environ.get("PH_CAMS", "2000"))
    T = int(os.environ.get("PH_TRACKS", "350000"))
    opt = int(os.environ.get("PH_OBS_PER_TRACK", "23"))
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    O = T * opt
    pt_idx = np.repeat(np.arange(T, dtype=np.int32), opt)
    cam_idx = rng.integers(0, C, O).astype(np.int32)

    if kind == "gp":
        problem = make_gp_problem()
        t_obs = rng.standard_normal((O, 3)).astype(np.float32)
        t_obs /= np.linalg.norm(t_obs, axis=-1, keepdims=True)
        params = Params(
            cam={"c": jnp.asarray(rng.uniform(-1, 1, (C, 3)), dtype)},
            pts=jnp.asarray(rng.uniform(-1, 1, (T, 3)), dtype),
            scales=jnp.ones((O, 1), dtype), scales_free=jnp.ones(O, bool))
        data = {"tx": jnp.asarray(t_obs[:, 0]),
                "ty": jnp.asarray(t_obs[:, 1]),
                "tz": jnp.asarray(t_obs[:, 2]), "w": jnp.ones(O, dtype)}
        kernel = robust.huber(0.1)
        cfg = LMConfig(pcg_iters=int(os.environ.get("PH_PCG", "100")),
                       radius_init=1e3, radius_max=1e8)
    else:
        problem = make_ba_problem(cm.SIMPLE_RADIAL)
        params = Params(
            cam={"q": jnp.asarray(np.tile([0, 0, 0, 1.0], (C, 1)), dtype),
                 "t": jnp.asarray(rng.standard_normal((C, 3)), dtype),
                 "intr": jnp.tile(jnp.asarray(
                     cm.pad_params([500.0, 320.0, 240.0, 0.01]), dtype),
                     (C, 1))},
            pts=jnp.asarray(rng.uniform(-2, 2, (T, 3)) + [0, 0, 8], dtype),
            scales=jnp.zeros((O, 1), dtype), scales_free=jnp.zeros(O, bool))
        data = {"x": jnp.asarray(rng.uniform(0, 640, O), dtype),
                "y": jnp.asarray(rng.uniform(0, 480, O), dtype)}
        kernel = robust.huber(1.0)
        cfg = LMConfig(pcg_iters=int(os.environ.get("PH_PCG", "100")),
                       radius_init=1e4, radius_max=1e10)

    obs = Observations(cam_idx=jnp.asarray(cam_idx),
                       pt_idx=jnp.asarray(pt_idx), data=data,
                       valid=jnp.ones(O, bool))
    t0 = time.time()
    params, obs, buckets, _ = bucketize_problem(params, obs, track_pad=256)
    print(f"[{kind}] bucketize {time.time()-t0:.1f}s, padded O = "
          f"{obs.valid.shape[0]:,}, buckets = {len(buckets)}")

    Tn = params.pts.shape[0]
    lam = jnp.asarray(1e-3, dtype)

    f_build = jax.jit(lambda p: build_system(problem, p, obs, kernel,
                                             num_points=Tn, buckets=buckets))

    def build_and_solve(p):
        sys_ = build_system(problem, p, obs, kernel, num_points=Tn,
                            buckets=buckets)
        d = solve_damped(problem, sys_, obs, lam, cfg.pcg_iters, cfg.pcg_tol,
                         dense_schur=False, buckets=buckets)
        return d[0], d[1]

    f_solve1 = jax.jit(build_and_solve)
    f_loss = jax.jit(lambda p: jnp.sum(compute_loss_vec(problem, p, obs,
                                                        kernel,
                                                        buckets=buckets)))
    f_step = jax.jit(lambda s: lm_step(problem, kernel, cfg, s, obs,
                                       buckets=buckets))
    state = LMState(params, lam, jnp.asarray(jnp.inf, dtype))

    def timeit(name, fn, arg, reps=3):
        out = fn(arg)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, 'shape') and x.size == 1
            else x.block_until_ready(), out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(arg)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])
        dt = (time.time() - t0) / reps
        print(f"[{kind}] {name:<8} {dt:7.3f} s")
        return dt

    tb = timeit("build", f_build, params)
    ts1 = timeit("solve1", f_solve1, params)
    tl = timeit("loss", f_loss, params)
    tstep = timeit("step", f_step, state)
    print(f"[{kind}] solve-only ~ {ts1-tb:.3f} s; "
          f"step - (build+solve+loss) ~ {tstep-ts1-tl:.3f} s "
          f"(retries + acceptance)")


if __name__ == "__main__":
    main()
