"""blocked_scatter_add must match plain scatter-add exactly-ish (fp32 add
order differs) across skew patterns: uniform, clustered, collisions, empty
tiles, non-multiple sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trinerflet_tpu.ops.scatter import (
    blocked_scatter_add,
    scatter_add_rows,
    xla_scatter_add,
)


def _check(idx, payload, num_rows, **kw):
    ref = np.zeros((num_rows, payload.shape[1]), np.float64)
    np.add.at(ref, np.asarray(idx), np.asarray(payload, np.float64))
    got = np.asarray(blocked_scatter_add(jnp.asarray(idx), jnp.asarray(payload),
                                         num_rows, **kw))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("num_rows,tile,block", [(1000, 128, 64), (4096, 256, 128)])
def test_uniform_random(num_rows, tile, block):
    rng = np.random.default_rng(0)
    n = 5000
    idx = rng.integers(0, num_rows, n).astype(np.int32)
    pay = rng.standard_normal((n, 8)).astype(np.float32)
    _check(idx, pay, num_rows, tile=tile, block=block)


def test_heavy_collisions_single_row():
    rng = np.random.default_rng(1)
    n = 3000
    idx = np.full(n, 7, np.int32)  # everything lands on one row
    pay = rng.standard_normal((n, 4)).astype(np.float32)
    _check(idx, pay, 512, tile=128, block=64)


def test_clustered_and_empty_tiles():
    rng = np.random.default_rng(2)
    n = 4000
    # all indices inside one tile; most tiles empty
    idx = (rng.integers(0, 100, n) + 2048).astype(np.int32)
    pay = rng.standard_normal((n, 16)).astype(np.float32)
    _check(idx, pay, 8192, tile=512, block=128)


def test_non_multiple_rows_and_extremes():
    rng = np.random.default_rng(3)
    n = 1537
    num_rows = 3001  # not a multiple of tile
    idx = np.concatenate([[0, num_rows - 1], rng.integers(0, num_rows, n - 2)]).astype(np.int32)
    pay = rng.standard_normal((n, 5)).astype(np.float32)
    _check(idx, pay, num_rows, tile=256, block=64)


def test_matches_xla_path_and_dispatch():
    rng = np.random.default_rng(4)
    n, rows = 2048, 1024
    idx = rng.integers(0, rows, n).astype(np.int32)
    pay = rng.standard_normal((n, 8)).astype(np.float32)
    a = np.asarray(xla_scatter_add(jnp.asarray(idx), jnp.asarray(pay), rows))
    b = np.asarray(scatter_add_rows(jnp.asarray(idx), jnp.asarray(pay), rows,
                                    strategy="blocked"))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)
    c = np.asarray(scatter_add_rows(jnp.asarray(idx), jnp.asarray(pay), rows))
    np.testing.assert_allclose(a, c, rtol=2e-5, atol=1e-5)


def test_grad_flows_through_payload():
    rng = np.random.default_rng(5)
    idx = jnp.asarray(rng.integers(0, 64, 256), jnp.int32)
    pay = jnp.asarray(rng.standard_normal((256, 4)), jnp.float32)

    def f(p):
        return blocked_scatter_add(idx, p, 64, tile=32, block=32).sum()

    g = jax.grad(f)(pay)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_default_precision_within_bf16_term_rounding():
    """precision='default' may round each payload term to bf16 before the
    exact-f32 accumulation (1-pass MXU semantics on TPU; full f32 on CPU).
    Either way the result must sit within per-term bf16 rounding of the
    exact sum."""
    rng = np.random.default_rng(6)
    n, rows = 4096, 1024
    idx = rng.integers(0, rows, n).astype(np.int32)
    pay = rng.standard_normal((n, 8)).astype(np.float32)
    got = np.asarray(blocked_scatter_add(jnp.asarray(idx), jnp.asarray(pay),
                                         rows, tile=256, block=128,
                                         precision="default"))
    ref = np.zeros((rows, 8), np.float64)
    np.add.at(ref, idx, pay.astype(np.float64))
    # bf16 keeps 8 mantissa bits: per-term relative error <= 2^-9; terms per
    # row here are ~4, |term| <= ~4 -> absolute slack ~ count * 4 * 2^-9
    np.testing.assert_allclose(got, ref, rtol=0, atol=(n / rows) * 4 * 2 ** -9 * 4)


class TestShardedBlockedScatter:
    """The shard_map (per-data-shard sort/scan + psum) form of the blocked
    scatter: exact agreement with plain scatter-add, on a real data mesh.
    'auto' routes here only on TPU backends (CPU executes native scatter
    ~650x faster than the emulated matmul scan), so this exercises the path
    explicitly via strategy='blocked' under an active mesh — the same graph
    real multi-chip TPU training compiles."""

    def test_matches_xla_on_data_mesh(self):
        import jax
        from trinerflet_tpu.parallel.sharding import (
            DATA_AXIS, active_mesh, make_mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(jax.devices()[:4], model_parallel=1)
        rng = np.random.default_rng(0)
        N, D, R = 4096, 8, 512
        idx = rng.integers(0, R, N).astype(np.int32)
        pay = rng.normal(size=(N, D)).astype(np.float32)
        sh = NamedSharding(mesh, P(DATA_AXIS))
        idx_d = jax.device_put(jnp.asarray(idx), sh)
        pay_d = jax.device_put(jnp.asarray(pay), sh)

        @jax.jit
        def go(i, p):
            with active_mesh(mesh):
                return scatter_add_rows(i, p, R, strategy="blocked")

        got = np.asarray(go(idx_d, pay_d))
        ref = np.asarray(xla_scatter_add(jnp.asarray(idx), jnp.asarray(pay), R))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)

    def test_data_and_model_mesh(self):
        import jax
        from trinerflet_tpu.parallel.sharding import (
            DATA_AXIS, MODEL_AXIS, active_mesh, make_mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(jax.devices()[:8], model_parallel=2)
        rng = np.random.default_rng(1)
        N, D, R = 2048, 16, 256
        idx = rng.integers(0, R, N).astype(np.int32)
        pay = rng.normal(size=(N, D)).astype(np.float32)
        idx_d = jax.device_put(jnp.asarray(idx),
                               NamedSharding(mesh, P(DATA_AXIS)))
        pay_d = jax.device_put(jnp.asarray(pay),
                               NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)))

        @jax.jit
        def go(i, p):
            with active_mesh(mesh):
                return scatter_add_rows(i, p, R, strategy="blocked")

        got = np.asarray(go(idx_d, pay_d))
        ref = np.asarray(xla_scatter_add(jnp.asarray(idx), jnp.asarray(pay), R))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


class TestFactoredOuterScatter:
    """blocked_scatter_add_outer: the factored (w, g) payload path used by
    the quad sampler's plane-gradient backward. precision='highest' must be
    BITWISE the materialized-payload blocked path (the in-body product is
    the same f32 product); sentinel / zero rows must drop exactly; the
    dynamic-trip block loop must agree with the static scan."""

    def _ref(self, idx, w, g, num_rows):
        pay = (w[:, :, None].astype(np.float64)
               * g[:, None, :].astype(np.float64)).reshape(len(idx), -1)
        ref = np.zeros((num_rows, pay.shape[1]), np.float64)
        keep = idx < num_rows
        np.add.at(ref, idx[keep], pay[keep])
        return ref

    def test_matches_materialized(self):
        from trinerflet_tpu.ops.scatter import blocked_scatter_add_outer

        rng = np.random.default_rng(7)
        n, rows, K, C = 4096, 2048, 4, 8
        idx = rng.integers(0, rows, n).astype(np.int32)
        w = rng.standard_normal((n, K)).astype(np.float32)
        g = rng.standard_normal((n, C)).astype(np.float32)
        for trip in ("dynamic", "static"):
            got = np.asarray(blocked_scatter_add_outer(
                jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g), rows,
                tile=256, block=128, precision="highest", trip=trip))
            np.testing.assert_allclose(got, self._ref(idx, w, g, rows),
                                       rtol=2e-5, atol=1e-5)

    def test_sentinel_and_zero_rows_dropped(self):
        from trinerflet_tpu.ops.scatter import blocked_scatter_add_outer

        rng = np.random.default_rng(8)
        n, rows, K, C = 3000, 1000, 4, 8  # rows not a tile multiple
        idx = rng.integers(0, rows, n).astype(np.int32)
        w = rng.standard_normal((n, K)).astype(np.float32)
        g = rng.standard_normal((n, C)).astype(np.float32)
        idx[::5] = rows          # explicit drop sentinel
        idx[1::7] = rows + 17    # any out-of-range index drops
        g[2::3] = 0.0            # zero-cotangent rows: exact no-ops
        got = np.asarray(blocked_scatter_add_outer(
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g), rows,
            tile=128, block=64, precision="highest"))
        np.testing.assert_allclose(got, self._ref(idx, w, g, rows),
                                   rtol=2e-5, atol=1e-5)

    def test_default_precision_bf16_factor_rounding(self):
        from trinerflet_tpu.ops.scatter import blocked_scatter_add_outer

        rng = np.random.default_rng(9)
        n, rows, K, C = 4096, 512, 4, 8
        idx = rng.integers(0, rows, n).astype(np.int32)
        w = rng.random((n, K)).astype(np.float32)  # bilinear-like, [0, 1)
        g = rng.standard_normal((n, C)).astype(np.float32)
        got = np.asarray(blocked_scatter_add_outer(
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g), rows,
            tile=128, block=128, precision="default"))
        ref = self._ref(idx, w, g, rows)
        # both factors round to bf16 (rel err <= 2^-9 each) before an exact
        # f32 accumulation; ~n/rows terms of magnitude <= ~3 per cell
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=(n / rows) * 3 * 2 ** -8)

    def test_dispatch_and_grad_semantics(self):
        from trinerflet_tpu.ops.scatter import scatter_add_outer

        rng = np.random.default_rng(10)
        n, rows, K, C = 1024, 256, 4, 4
        idx = rng.integers(0, rows, n).astype(np.int32)
        w = rng.random((n, K)).astype(np.float32)
        g = rng.standard_normal((n, C)).astype(np.float32)
        got = np.asarray(scatter_add_outer(
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g), rows))
        np.testing.assert_allclose(got, self._ref(idx, w, g, rows),
                                   rtol=2e-5, atol=1e-5)

    def test_blocked_sentinel_rows_dropped(self):
        """The plain blocked path honors the same >= num_rows drop marker."""
        rng = np.random.default_rng(11)
        n, rows = 2000, 700
        idx = rng.integers(0, rows, n).astype(np.int32)
        idx[::4] = rows
        pay = rng.standard_normal((n, 6)).astype(np.float32)
        ref = np.zeros((rows, 6), np.float64)
        keep = idx < rows
        np.add.at(ref, idx[keep], pay[keep].astype(np.float64))
        for trip in ("dynamic", "static"):
            got = np.asarray(blocked_scatter_add(
                jnp.asarray(idx), jnp.asarray(pay), rows, tile=128, block=64,
                trip=trip))
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)

    def test_sharded_outer_on_data_model_mesh(self):
        from trinerflet_tpu.ops.scatter import scatter_add_outer
        from trinerflet_tpu.parallel.sharding import (
            DATA_AXIS, active_mesh, make_mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(jax.devices()[:8], model_parallel=2)
        rng = np.random.default_rng(12)
        n, rows, K, C = 2048, 256, 4, 8
        idx = rng.integers(0, rows, n).astype(np.int32)
        w = rng.random((n, K)).astype(np.float32)
        g = rng.standard_normal((n, C)).astype(np.float32)
        sh = NamedSharding(mesh, P(DATA_AXIS))
        args = [jax.device_put(jnp.asarray(a), sh) for a in (idx, w, g)]

        @jax.jit
        def go(i, wl, gl):
            with active_mesh(mesh):
                return scatter_add_outer(i, wl, gl, rows, strategy="blocked",
                                         precision="highest")

        got = np.asarray(go(*args))
        np.testing.assert_allclose(got, self._ref(idx, w, g, rows),
                                   rtol=2e-5, atol=1e-5)
