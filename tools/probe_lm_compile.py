"""Compile-only memory probe for the jitted LM step at large scale.

Builds a synthetic GP- or BA-shaped bucketized problem at a requested size,
lowers + compiles ONE lm_step on the real TPU (no data ever transfers), and
prints the compiler's memory analysis.  This is how the config-4 (2k-image)
OOMs were iterated without paying a full pipeline run per attempt.

Usage:
    python tools/probe_lm_compile.py gp 2000 900000 9300000
    python tools/probe_lm_compile.py ba 2000 900000 9300000
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "gp"
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 900_000
    O = int(sys.argv[4]) if len(sys.argv) > 4 else 9_300_000

    import jax
    import jax.numpy as jnp
    from functools import partial

    from instantsfm_tpu.solve import robust
    from instantsfm_tpu.solve.block_lm import (LMConfig, LMState,
                                               Observations, Params, lm_step)
    from instantsfm_tpu.solve.blocked import bucketize_problem
    from instantsfm_tpu.solve.problems import (make_ba_problem,
                                               make_gp_problem)

    rng = np.random.default_rng(0)
    # track lengths ~ geometric-ish around O/T, assigned sorted by point
    lengths = np.maximum(2, rng.poisson(O / T, T))
    pt_idx = np.repeat(np.arange(T), lengths)[:O]
    pt_idx.sort()
    O = len(pt_idx)
    cam_idx = rng.integers(0, C, O).astype(np.int32)

    if kind == "gp":
        problem = make_gp_problem()
        cam = {"c": jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)}
        data = {"tx": np.ones(O, np.float32), "ty": np.ones(O, np.float32),
                "tz": np.ones(O, np.float32), "w": np.ones(O, np.float32)}
        scales = np.ones((O, 1), np.float32)
        sfree = np.ones(O, bool)
    else:
        from instantsfm_tpu.scene import cameras as cm
        problem = make_ba_problem(cm.SIMPLE_RADIAL)
        q = np.tile([0, 0, 0, 1.0], (C, 1))
        cam = {"q": jnp.asarray(q, jnp.float32),
               "t": jnp.asarray(rng.standard_normal((C, 3)), jnp.float32),
               "intr": jnp.asarray(
                   np.tile(cm.pad_params([500.0, 320, 240, 0.0]), (C, 1)),
                   jnp.float32)}
        data = {"x": np.ones(O, np.float32), "y": np.ones(O, np.float32)}
        scales = np.zeros((O, 1), np.float32)
        sfree = np.zeros(O, bool)

    params = Params(cam=cam,
                    pts=jnp.asarray(rng.standard_normal((T, 3)), jnp.float32),
                    scales=jnp.asarray(scales),
                    scales_free=jnp.asarray(sfree))
    obs = Observations(cam_idx=jnp.asarray(cam_idx),
                       pt_idx=jnp.asarray(pt_idx),
                       data={k: jnp.asarray(v) for k, v in data.items()},
                       valid=jnp.ones(O, bool))
    params_b, obs_b, buckets, _ = bucketize_problem(params, obs)
    Opad = obs_b.valid.shape[0]
    print(f"{kind}: C={C} T={T} O={O} bucket-padded O'={Opad} "
          f"buckets={len(buckets)}", flush=True)

    cfg = LMConfig(max_iterations=1, pcg_iters=25, solver="pcg")
    step = jax.jit(partial(lm_step, problem, robust.huber(1.0), cfg,
                           buckets=buckets))
    state = LMState(params_b, jnp.asarray(1e-4, jnp.float32),
                    jnp.asarray(jnp.inf, jnp.float32))
    shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (state, obs_b))
    try:
        c = step.lower(shapes[0], shapes[1]).compile()
        ma = c.memory_analysis()
        print(f"COMPILED: temp={ma.temp_size_in_bytes/1e9:.2f} GB "
              f"args={ma.argument_size_in_bytes/1e9:.2f} GB")
    except Exception as e:
        msg = str(e)
        print("COMPILE FAILED:")
        print(msg[:4000])


if __name__ == "__main__":
    main()
