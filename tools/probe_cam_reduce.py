"""Probe: camera-axis segment reduction strategies on the real chip.

The r3 trace attributes ~10 ms/step of the BA LM step to chunked one-hot
cam_reduce fori loops (PERF_NOTES.md).  This probe times, with the repeated-
scan + d2h protocol (block_until_ready does not block through the tunnel):

  fori   — current production ``cam_reduce`` (chunked one-hot fori loop)
  onehot_f32  — one-shot materialized f32 one-hot, single HIGHEST dot
  onehot_bf16 — one-shot bf16 one-hot converted at the dot (HIGHEST)
  premat_bf16 — bf16 one-hot materialized ONCE outside the loop, dot per rep
  segsum — jax.ops.segment_sum baseline

at the bench shapes (O=400k C=200, K in {8, 72}) and the BA500-ish shape
(O=4M C=500, K=72).  Usage: python tools/probe_cam_reduce.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from instantsfm_tpu.solve.block_lm import cam_reduce

REPS = 30


def timed(fn, *args):
    """Median-of-3 of (scan-over-REPS) wall time per rep, d2h-synced."""
    jfn = jax.jit(fn)
    out = jfn(*args)                       # compile
    float(jnp.sum(out))
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = jfn(*args)
        float(jnp.sum(out))
        ts.append((time.time() - t0) / REPS)
    return sorted(ts)[1]


def rep_loop(reduce_fn):
    """Run the reduction REPS times with a data dependency preventing CSE."""
    def fn(vals, cam_idx):
        def body(carry, _):
            out = reduce_fn(vals + carry, cam_idx)
            return out.reshape(-1)[0] * 1e-30, out
        carry, outs = jax.lax.scan(body, jnp.zeros((), vals.dtype),
                                   None, length=REPS)
        return outs[-1] + carry
    return fn


def onehot_dot(vals, cam_idx, C, oh_dtype):
    classes = jnp.arange(C, dtype=cam_idx.dtype)
    oh = (cam_idx[:, None] == classes[None, :]).astype(oh_dtype)
    if oh_dtype != vals.dtype:
        oh = oh.astype(vals.dtype)
    return jnp.dot(oh.T, vals, preferred_element_type=vals.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def premat_dot(vals, ohT):
    oh = ohT.astype(vals.dtype)
    return jnp.dot(oh, vals, preferred_element_type=vals.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    rng = np.random.default_rng(0)
    for (O, C, K) in [(400_000, 200, 8), (400_000, 200, 72),
                      (4_000_000, 500, 72)]:
        vals = jnp.asarray(rng.standard_normal((O, K)), jnp.float32)
        cam_idx = jnp.asarray(rng.integers(0, C, O), jnp.int32)
        classes = jnp.arange(C, dtype=jnp.int32)
        ohT = (cam_idx[None, :] == classes[:, None]).astype(jnp.bfloat16)

        rows = {}
        for label, fn in [
            ("fori", lambda v, i: cam_reduce(v, i, C)),
            ("onehot_f32", lambda v, i: onehot_dot(v, i, C, jnp.float32)),
            ("onehot_bf16", lambda v, i: onehot_dot(v, i, C, jnp.bfloat16)),
            ("premat_bf16", lambda v, i: premat_dot(v, ohT)),
            ("segsum", lambda v, i: jax.ops.segment_sum(v, i,
                                                        num_segments=C)),
        ]:
            rows[label] = timed(rep_loop(fn), vals, cam_idx)
            print(f"  O={O} C={C} K={K} {label}: {rows[label]*1e3:.3f} ms",
                  flush=True)

        # numeric check vs fori (exact-f32 reference)
        ref = np.asarray(cam_reduce(vals, cam_idx, C))
        err16 = np.abs(np.asarray(onehot_dot(vals, cam_idx, C, jnp.bfloat16))
                       - ref).max() / (np.abs(ref).max() + 1e-30)
        print(f"O={O} C={C} K={K}:  " +
              "  ".join(f"{k}={v*1e3:.3f}ms" for k, v in rows.items()) +
              f"  bf16_rel_err={err16:.2e}")


if __name__ == "__main__":
    main()
