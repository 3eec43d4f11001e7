"""Probe: how XLA's compiled cost model counts control-flow bodies.

Evidence behind utils/roofline.py's analytic traffic model (and bench.py's
switch away from ``compiled.cost_analysis()``): jit a ``fori_loop`` /
``while_loop`` of K large matmuls and read back the modeled FLOPs / bytes.

Measured on tpu-v5e (jax 0.9, 2026-08):

    fori  n=  1: flops=    17.180G bytes=      83.9M
    fori  n=  4: flops=    17.184G bytes=     167.8M
    fori  n= 16: flops=    17.184G bytes=     167.8M
    while n=  1: flops=    17.180G bytes=      83.9M
    while n=  4: flops=    17.184G bytes=     167.8M
    while n= 16: flops=    17.184G bytes=     167.8M

One 2048^3 matmul is 17.18 GFLOP: the body is counted exactly ONCE no matter
the trip count (n=1 differs only because XLA unrolls it).  Any step whose
hot work sits inside a loop — the LM step's PCG while_loop, cam_reduce's
chunked fori — is therefore misstated by the cost model by the (data-
dependent) trip count, in both directions at once.

Run: ``python tools/probe_xla_cost_model.py`` (any backend with
cost_analysis support; TPU numbers above).
"""

import jax
import jax.numpy as jnp


def _counts(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def probe_fori(n_iters):
    def f(x):
        return jax.lax.fori_loop(0, n_iters, lambda i, acc: acc @ x, x)
    x = jnp.zeros((2048, 2048), jnp.float32)
    return _counts(jax.jit(f).lower(x).compile())


def probe_while(n_iters):
    def f(x):
        def body(s):
            a, k = s
            return a @ x, k + 1
        return jax.lax.while_loop(lambda s: s[1] < n_iters, body,
                                  (x, jnp.asarray(0, jnp.int32)))[0]
    x = jnp.zeros((2048, 2048), jnp.float32)
    return _counts(jax.jit(f).lower(x).compile())


if __name__ == "__main__":
    for n in (1, 4, 16):
        fl, by = probe_fori(n)
        print(f"fori  n={n:3d}: flops={fl / 1e9:10.3f}G bytes={by / 1e6:10.1f}M")
    for n in (1, 4, 16):
        fl, by = probe_while(n)
        print(f"while n={n:3d}: flops={fl / 1e9:10.3f}G bytes={by / 1e6:10.1f}M")
