"""Restructured BatchNorm statistics (OpImpl.bn_stats='dot'/'pallas') parity.

The knob must be exact-math interchangeable with flax nn.BatchNorm (the
default path): same param/variable tree, same train/eval outputs, same
gradients, same running-stat updates, same sync-BN cross-replica stats.
See mmhand_tpu/ops/bn_stats.py for the profile evidence behind the knob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmhand_tpu.models.layers import Norm, NormConfig, OpImpl
from mmhand_tpu.ops.bn_stats import bn_moments

DOT = OpImpl(bn_stats="dot", bn_stats_min=0)
PALLAS = OpImpl(bn_stats="pallas", bn_stats_min=0)
REDUCE = OpImpl(bn_stats="reduce")

parametrize_method = pytest.mark.parametrize("method", ["dot", "pallas"])
parametrize_impl = pytest.mark.parametrize("impl", [DOT, PALLAS],
                                           ids=["dot", "pallas"])


class TestBnMoments:
    @parametrize_method
    def test_matches_reduce_moments(self, method):
        x = jnp.asarray(np.random.RandomState(0)
                        .normal(size=(4, 9, 7, 13)), jnp.float32)
        mu, mu2 = bn_moments(x, method=method)
        xf = x.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(mu),
                                   np.asarray(xf.mean((0, 1, 2))),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mu2),
                                   np.asarray((xf * xf).mean((0, 1, 2))),
                                   rtol=1e-6, atol=1e-6)

    @parametrize_method
    def test_custom_vjp_matches_autodiff_of_reduce(self, method):
        x = jnp.asarray(np.random.RandomState(1)
                        .normal(size=(2, 5, 5, 3)), jnp.float32)
        co_mu = jnp.asarray(np.random.RandomState(2).normal(size=(3,)),
                            jnp.float32)
        co_mu2 = jnp.asarray(np.random.RandomState(3).normal(size=(3,)),
                             jnp.float32)

        def via_dot(x):
            mu, mu2 = bn_moments(x, method=method)
            return jnp.vdot(mu, co_mu) + jnp.vdot(mu2, co_mu2)

        def via_reduce(x):
            xf = x.astype(jnp.float32)
            return (jnp.vdot(xf.mean((0, 1, 2)), co_mu)
                    + jnp.vdot((xf * xf).mean((0, 1, 2)), co_mu2))

        np.testing.assert_allclose(np.asarray(jax.grad(via_dot)(x)),
                                   np.asarray(jax.grad(via_reduce)(x)),
                                   rtol=1e-5, atol=1e-6)

    @parametrize_method
    def test_bf16_inputs_accumulate_f32(self, method):
        x = jnp.asarray(np.random.RandomState(4)
                        .normal(size=(8, 16, 16, 5)), jnp.bfloat16)
        mu, mu2 = bn_moments(x, method=method)
        assert mu.dtype == jnp.float32 and mu2.dtype == jnp.float32
        xf = x.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(mu),
                                   np.asarray(xf.mean((0, 1, 2))),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mu2),
                                   np.asarray((xf * xf).mean((0, 1, 2))),
                                   rtol=1e-5, atol=1e-5)


class TestDotStatsBNParity:
    """Norm(kind='batch') with the knob == flax nn.BatchNorm without it."""

    def _norm(self, axis_name=None, impl=REDUCE):
        return Norm(NormConfig(kind="batch", axis_name=axis_name),
                    dtype=jnp.float32, impl=impl)

    def _x(self, seed=0, shape=(4, 8, 8, 6)):
        return jnp.asarray(np.random.RandomState(seed).normal(size=shape),
                           jnp.float32)

    @parametrize_impl
    def test_tree_and_train_output_match(self, impl):
        x = self._x()
        m = self._norm()
        md = self._norm(impl=impl)
        vs0 = m.init(jax.random.PRNGKey(0), x, train=False)
        y0, upd0 = m.apply(vs0, x, train=True, mutable=["batch_stats"])
        vs1 = md.init(jax.random.PRNGKey(0), x, train=False)
        assert (jax.tree_util.tree_structure(vs0)
                == jax.tree_util.tree_structure(vs1))
        for a, b in zip(jax.tree.leaves(vs0), jax.tree.leaves(vs1)):
            assert a.shape == b.shape and a.dtype == b.dtype
        y1, upd1 = md.apply(vs0, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
        # running-stat updates (momentum 0.9) match
        for a, b in zip(jax.tree.leaves(upd0), jax.tree.leaves(upd1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_eval_output_matches(self):
        x = self._x(1)
        m = self._norm()
        vs = m.init(jax.random.PRNGKey(0), x, train=False)
        # give the running stats non-trivial values
        _, upd = m.apply(vs, x, train=True, mutable=["batch_stats"])
        vs = {"params": vs["params"], "batch_stats": upd["batch_stats"]}
        y0 = m.apply(vs, x, train=False)
        y1 = self._norm(impl=DOT).apply(vs, x, train=False)
        y2 = self._norm(impl=PALLAS).apply(vs, x, train=False)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y2),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-6, atol=1e-6)

    @parametrize_impl
    def test_gradients_match(self, impl):
        x = self._x(2)
        m = self._norm()
        vs = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params, xin, module):
            out, _ = module.apply({"params": params,
                                   "batch_stats": vs["batch_stats"]},
                                  xin, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        gp0, gx0 = jax.grad(loss, argnums=(0, 1))(vs["params"], x, m)
        gp1, gx1 = jax.grad(loss, argnums=(0, 1))(
            vs["params"], x, self._norm(impl=impl))
        # The bias grad 2*sum(out) is analytically ZERO (BN output is
        # zero-mean), so both sides are pure f32 cancellation noise of
        # order N*eps*|x| ~ 3e-5 at N=256; the summation-order difference
        # between the stat formulations lands there in full.  atol covers
        # the noise floor; rtol still pins the non-degenerate scale grad.
        for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                                   rtol=1e-4, atol=1e-5)

    def test_shape_gate_routes_to_flax(self):
        """Below OpImpl.bn_stats_min the flax reduce path is kept (the
        Gram's N*C^2 MACs only pay off at stem resolution)."""
        x = self._x(3)  # 4*8*8 << 2^18
        m = self._norm(impl=OpImpl(bn_stats="dot", bn_stats_min=1 << 18))
        vs = m.init(jax.random.PRNGKey(0), x, train=False)
        y, _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
        assert y.shape == x.shape  # and the tree is the flax one
        assert "BatchNorm_0" in vs["params"]

    def test_sync_bn_matches_full_batch(self):
        """axis_name pmean-of-moments: per-shard dot stats == full-batch
        stats (the sync-BN contract the flax path is parity-tested to)."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("data",))
        x = self._x(5, shape=(8, 4, 4, 6))
        m_sync = Norm(NormConfig(kind="batch", axis_name="data"),
                      dtype=jnp.float32, impl=DOT)
        m_full = self._norm(impl=DOT)
        vs = m_full.init(jax.random.PRNGKey(0), x, train=False)

        def shard_fn(xs):
            y, upd = m_sync.apply(vs, xs, train=True,
                                  mutable=["batch_stats"])
            return y, upd["batch_stats"]

        y_sh, bs_sh = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=P("data"), out_specs=(P("data"), P())))(x)
        y_full, upd_full = m_full.apply(vs, x, train=True,
                                        mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_full),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree.leaves(bs_sh),
                        jax.tree.leaves(upd_full["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
