"""Probe: tile/block tuning for blocked_scatter_add.

Scan-stage one-hot matmul FLOPs ~ D * (N*tile + 0.5*R*block) — smaller
tiles/blocks cut MXU work but raise the lax.scan iteration count
(per-iteration overhead). Sweep the grid both directions at the bench-scale
problem (655k x 64 -> 1M rows) in both precisions to find the knee.

Run: nohup python -u -m scripts.bench_scatter_tune > /tmp/bstune.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.ops.scatter import blocked_scatter_add

N, D, R = 655360, 64, 1024 * 1024
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, R, N), jnp.int32)
payload = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
payload_bf16 = payload.astype(jnp.bfloat16)

ref = None

for prec, pl in (("highest", payload), ("default", payload_bf16)):
    for tile, block in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                        (1024, 2048), (2048, 512), (2048, 1024),
                        (2048, 2048), (4096, 2048)]:
        fn = jax.jit(lambda i, p, t=tile, b=block, pr=prec:
                     blocked_scatter_add(i, p, R, tile=t, block=b, precision=pr))
        out = fn(idx, pl)
        s = float(jnp.sum(out))
        if prec == "highest":
            if ref is None:
                ref = s
            assert abs(s - ref) < 1e-3 * abs(ref) + 1e-3, (s, ref)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(idx, pl)
        float(jnp.sum(out[:1, :1]))
        dt = (time.perf_counter() - t0) / 10
        print(f"{prec:8s} tile={tile:5d} block={block:5d}: {dt * 1e3:7.2f} ms",
              flush=True)
