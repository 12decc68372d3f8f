"""Root-cause probe for the d=8 weak-scaling cliff (VERDICT r3 item 8).

r3_multichip_cpu_weak_scaling measured flat 5-11% overhead at data=2/4 but
an 8.5x blowup at data=8 on the 8-virtual-device CPU mesh. This host has
ONE physical core (nproc=1), so all virtual device threads time-share it.
Hypothesis: the cliff is XLA:CPU collective rendezvous (spin-wait across
device threads) on the oversubscribed core — an emulation artifact, not a
property of the sharding design.

Test: strip the framework away entirely.
  (a) sharded elementwise step, NO collectives  -> pure compute baseline
  (b) the same + one psum                       -> adds one rendezvous
  (c) grads-psum-shaped: K small psums          -> the train step's pattern

If (b)/(c) reproduce the 4->8 cliff while (a) scales ~linearly (ideal for
time-shared devices), the cliff is the collective emulation. Run:
  python -m scripts.bench_psum_microbench
"""
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def timeit(fn, x, reps=20):
    fn(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3


def run(n_dev: int, rows_per_dev: int = 4096, width: int = 256, k_psums: int = 8):
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devs), ("d",))
    sh = NamedSharding(mesh, P("d"))
    x = jax.device_put(
        jnp.ones((rows_per_dev * n_dev, width), jnp.float32), sh)

    @jax.jit
    def no_collective(x):
        for _ in range(4):
            x = jnp.tanh(x @ jnp.ones((width, width), x.dtype) * 1e-3)
        return x

    @jax.jit
    def one_psum(x):
        y = no_collective(x)
        s = jax.lax.with_sharding_constraint(
            jnp.sum(y, axis=0, keepdims=True), NamedSharding(mesh, P()))
        return y + s  # forces the cross-device reduction

    @jax.jit
    def k_small_psums(x):
        y = no_collective(x)
        acc = 0.0
        for i in range(k_psums):
            acc = acc + jnp.sum(y[:, i::k_psums])
        return y + acc  # k reductions, each tiny (the grads-psum shape)

    return (timeit(no_collective, x), timeit(one_psum, x),
            timeit(k_small_psums, x))


def main():
    print(f"nproc={os.cpu_count()}, devices={len(jax.devices())}")
    base = None
    print(f"{'d':>2} {'compute ms':>12} {'(ovh)':>7} {'+1 psum ms':>12} "
          f"{'(ovh)':>7} {'+8 psums ms':>12} {'(ovh)':>7}")
    for d in (1, 2, 4, 8):
        a, b, c = run(d)
        if base is None:
            base = (a, b, c)
        ov = [v / (d * b0) for v, b0 in zip((a, b, c), base)]
        print(f"{d:>2} {a:12.2f} {ov[0]:7.2f} {b:12.2f} {ov[1]:7.2f} "
              f"{c:12.2f} {ov[2]:7.2f}", flush=True)


if __name__ == "__main__":
    main()
