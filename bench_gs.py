"""3DGS training-step benchmark on real hardware (companion to bench.py).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Scene: synthetic 100k-gaussian pool, one 800x608 view per step, full
training step (SH eval + EWA projection + tile sort + Pallas compositing
fwd/bwd + L1+SSIM loss + Adam on all param groups) as a dependent chain —
the steady-state analog of ``gsplat_trainer`` steps (reference
``vis/gsplat_trainer.py:514-723``).

``vs_baseline``: the computed roofline of the step (XLA cost model FLOPs +
HBM bytes over the chip's public peaks; see instantsfm_tpu/utils/roofline.py)
— vs_baseline = roofline_frac, 1.0 == the binding roofline.  NB: the Pallas
compositing kernels' internal traffic is opaque to the XLA cost model, so
the byte count (and thus roofline_frac) is an underestimate for this step;
the number is a lower bound.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax.numpy as jnp
    import optax

    from instantsfm_tpu.gs import rasterize, splats as splats_mod, ssim as ssim_mod

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

    def loss_fn(fparams):
        sp = splats_mod.with_float_params(splats, fparams)
        opac = jax.nn.sigmoid(sp.opacities) * alive
        out = rasterize.rasterize(
            sp.means, sp.quats, jnp.exp(sp.scales), opac,
            jnp.concatenate([sp.sh0, sp.shN], axis=1), viewmat, K,
            width=W, height=H, sh_degree=3, tile_capacity=512)
        l1 = jnp.mean(jnp.abs(out.rgb - target))
        s = ssim_mod.ssim(out.rgb, target)
        return 0.8 * l1 + 0.2 * (1 - s)

    @jax.jit
    def step(fparams, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(fparams)
        updates, opt_state = tx.update(grads, opt_state, fparams)
        return optax.apply_updates(fparams, updates), opt_state, loss

    N_WARM, N = 3, 20
    for _ in range(N_WARM):
        fparams, opt_state, loss = step(fparams, opt_state)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(N):
        fparams, opt_state, loss = step(fparams, opt_state)
    # time through a host readback: on tunneled backends block_until_ready
    # can return before execution finishes; a d2h readback cannot.
    float(loss)
    dt = time.perf_counter() - t0
    its = N / dt

    from instantsfm_tpu.utils.roofline import analyze
    rec = {
        "metric": "gs_train_iters_per_sec",
        "value": round(its, 3),
        "unit": "iter/s (100k gaussians, 800x608, SH3, full step); "
                "vs_baseline = roofline_frac (lower bound, Pallas-opaque)",
        "vs_baseline": None,
    }
    try:
        compiled = step.lower(fparams, opt_state).compile()
        rl = analyze(compiled, dt / N)
        import math
        frac = (round(rl.roofline_frac, 3)
                if math.isfinite(rl.roofline_frac) else None)
        rec.update({
            "vs_baseline": frac,
            "roofline_frac": frac,
            "mfu": round(rl.mfu, 4),
            "membw_util": round(rl.membw_util, 4),
            "bound": rl.bound,
            "chip": rl.chip,
            "gflops_per_iter": round(rl.flops / 1e9, 2),
            "hbm_gb_per_iter": round(rl.hbm_bytes / 1e9, 3),
        })
    except Exception as e:
        rec["vs_baseline"] = round(its / 40.0, 3)
        rec["roofline_error"] = str(e)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
