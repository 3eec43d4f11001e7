"""LightGlue matcher throughput (pairs/s) with random weights.

Measures the batched ``match_all_pairs`` path (one jitted [B, ...] program
per batch, single readback) on whatever backend is active — run on the TPU
for the PERF_NOTES number.  Random weights exercise the identical compute
graph as converted checkpoints (VERDICT r3 directive 6 done-criterion).

    python tools/bench_lightglue.py [n_images] [kps] [batch]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax

    from instantsfm_tpu import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from instantsfm_tpu.features import lightglue as lg

    rng = np.random.default_rng(0)
    kpts = rng.uniform(0, 640, (n, M, 2)).astype(np.float32)
    descs = rng.standard_normal((n, M, 256)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    valids = np.ones((n, M), bool)
    sizes = np.tile([640.0, 480.0], (n, 1)).astype(np.float32)
    w = lg.random_weights(jax.random.PRNGKey(0))
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    cfg = lg.LightGlueConfig(max_matches=2048)

    t0 = time.time()
    out = lg.match_all_pairs(kpts, descs, valids, sizes, w, pairs=pairs,
                             cfg=cfg, batch=batch)
    cold = time.time() - t0
    t0 = time.time()
    out = lg.match_all_pairs(kpts, descs, valids, sizes, w, pairs=pairs,
                             cfg=cfg, batch=batch)
    warm = time.time() - t0
    rec = {"metric": "lightglue_pairs_per_sec",
           "value": round(len(pairs) / warm, 1),
           "unit": f"pairs/s warm ({n} imgs, {M} kps, 9 layers, batch "
                   f"{batch}, random weights)",
           "warm_sec": round(warm, 2), "cold_sec": round(cold, 2),
           "n_pairs": len(pairs),
           "backend": jax.default_backend()}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
