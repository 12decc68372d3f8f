"""Probe: can the blocked-scatter payload reordering drop the row-gather?

blocked_scatter_add stages (655k x 64 rows, PERF.md): sort keys 9 ms,
payload row-GATHER into sorted order 14 ms, scan 13 ms. The PERF primitive
table measured multi-operand lax.sort payloads as ~free, so sorting the
payload columns as sort operands could replace the 14 ms gather with ~0.

Run: nohup python -u -m scripts.bench_scatter_sortops > /tmp/bsortops.log 2>&1 &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from trinerflet_tpu.ops.scatter import blocked_scatter_add


def force(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:1]))


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    print(f"{name:38s}: {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
          flush=True)


N, D, R = 655360, 64, 1024 * 1024
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, R, N), jnp.int32)
payload = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
payload_bf16 = payload.astype(jnp.bfloat16)

# current: argsort + one row-gather of [idx | payload]
def cur(idx, payload):
    order = jnp.argsort(idx)
    ext = jnp.concatenate([idx.astype(jnp.float32)[:, None], payload], axis=1)
    return jnp.take(ext, order, axis=0)


timeit("a argsort + row-gather (cur)", jax.jit(cur), idx, payload)


# candidate: multi-operand sort, payload columns as operands
def sortops(idx, payload):
    ops = (idx,) + tuple(payload[:, i] for i in range(D))
    out = jax.lax.sort(ops, num_keys=1)
    return out[0], jnp.stack(out[1:], axis=1)


timeit("b multi-op sort (64 f32 cols)", jax.jit(sortops), idx, payload)


# candidate: pack payload pairs into fewer wider operands (f32 pair -> i64? no;
# bf16 pair -> one f32 via bitcast)
def sortops_packed(idx, payload_bf16):
    pb = payload_bf16.reshape(N, D // 2, 2)
    packed = jax.lax.bitcast_convert_type(pb, jnp.float32).reshape(N, D // 2)
    ops = (idx,) + tuple(packed[:, i] for i in range(D // 2))
    out = jax.lax.sort(ops, num_keys=1)
    sp = jnp.stack(out[1:], axis=1)
    return out[0], jax.lax.bitcast_convert_type(
        sp.reshape(N, D // 2, 1), jnp.bfloat16).reshape(N, D)


timeit("c multi-op sort (32 packed bf16)", jax.jit(sortops_packed), idx, payload_bf16)


# candidate: sort (key, rank) only, then row-gather — baseline decomposition
def sort_rank(idx):
    r = jnp.arange(N, dtype=jnp.int32)
    return jax.lax.sort((idx, r), num_keys=1)


timeit("d sort key+rank only", jax.jit(sort_rank), idx)


# bf16 payload row-gather (half bandwidth of the 14 ms f32 gather)
def gather_bf16(idx, payload_bf16):
    order = jnp.argsort(idx)
    return jnp.take(payload_bf16, order, axis=0)


timeit("e bf16 payload row-gather", jax.jit(gather_bf16), idx, payload_bf16)

# end-to-end current blocked scatter for reference
timeit("f blocked_scatter_add f32/highest",
       jax.jit(lambda i, p: blocked_scatter_add(i, p, R)), idx, payload)
timeit("g blocked_scatter_add bf16/default",
       jax.jit(lambda i, p: blocked_scatter_add(i, p, R, precision="default")),
       idx, payload_bf16)
