"""Train-engine tests: image pool semantics, step schedule, LR schedule,
and the full jitted step (single-device and 8-way sharded)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmhand_tpu.config import Config, ModelConfig, OptimConfig
from mmhand_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate_state_for_mesh,
    shard_batch,
)
from mmhand_tpu.train import (
    MMHandSystem,
    lr_for_epoch,
    make_train_step,
    pool_init,
    pool_query,
)


class TestImagePool:
    def test_fill_phase_passthrough(self):
        """While filling, images are stored and returned unchanged
        (reference util/image_pool.py:20-23)."""
        pool = pool_init(8, (2, 2, 1))
        batch = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1) * jnp.ones(
            (4, 2, 2, 1))
        new_pool, out = pool_query(pool, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(out, batch)
        assert int(new_pool.num) == 4
        np.testing.assert_allclose(new_pool.images[:4], batch)

    def test_pool_size_zero_passthrough(self):
        pool = pool_init(0, (2, 2, 1))
        batch = jnp.ones((3, 2, 2, 1))
        new_pool, out = pool_query(pool, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(out, batch)

    def test_replay_statistics(self):
        """Once full, ~half the returns are replayed old images
        (reference :24-32: p>0.5 swap)."""
        pool = pool_init(4, (1, 1, 1))
        fill = jnp.full((4, 1, 1, 1), -1.0)
        pool, _ = pool_query(pool, fill, jax.random.PRNGKey(0))
        assert int(pool.num) == 4

        replays = 0
        total = 0
        query = jax.jit(pool_query)
        for i in range(50):
            batch = jnp.full((4, 1, 1, 1), float(i))
            pool, out = query(pool, batch, jax.random.PRNGKey(100 + i))
            replays += int(jnp.sum(out != float(i)))
            total += 4
        frac = replays / total
        assert 0.3 < frac < 0.7  # p=0.5 swap policy

    def test_swap_stores_new_image(self):
        pool = pool_init(2, (1, 1, 1))
        pool, _ = pool_query(pool, jnp.zeros((2, 1, 1, 1)),
                             jax.random.PRNGKey(0))
        for i in range(20):
            pool, _ = pool_query(pool, jnp.full((2, 1, 1, 1), float(i + 1)),
                                 jax.random.PRNGKey(i))
        # after many swaps the pool should no longer be all zeros
        assert float(jnp.abs(pool.images).sum()) > 0


class TestLRSchedule:
    def test_lambda_policy_constant_then_decay(self):
        """lr_l = 1 - max(0, e+1+count-niter)/(decay+1)
        (reference network_utils.py:87-95)."""
        cfg = Config(optim=OptimConfig(lr=2e-4, niter=500, niter_decay=200,
                                       epoch_count=1))
        assert lr_for_epoch(cfg, 0) == pytest.approx(2e-4)
        assert lr_for_epoch(cfg, 498) == pytest.approx(2e-4)
        # epoch 499: mult = 1 - (499+1+1-500)/201 = 1 - 1/201
        assert lr_for_epoch(cfg, 499) == pytest.approx(2e-4 * (1 - 1 / 201))
        # last decay epoch: mult -> ~0
        assert lr_for_epoch(cfg, 699) == pytest.approx(2e-4 * (1 - 201 / 201))

    def test_step_policy(self):
        cfg = Config(optim=OptimConfig(lr=1e-3, lr_policy="step",
                                       lr_decay_iters=50))
        assert lr_for_epoch(cfg, 49) == pytest.approx(1e-3)
        assert lr_for_epoch(cfg, 50) == pytest.approx(1e-4)


def _tiny_cfg(**opt_kw):
    return Config(
        model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8, ndf=8),
        optim=OptimConfig(pool_size=4, **opt_kw))


def _batch(bsz, size=32, seed=0):
    rng = np.random.RandomState(seed)
    return {k: jnp.asarray(rng.uniform(-1, 1, (bsz, size, size, c))
                           .astype(np.float32))
            for k, c in [("H1", 3), ("H2", 3), ("D1", 3), ("D2", 3),
                         ("P1", 21), ("P2", 21)]}


def _make(cfg, axis_name=None):
    system = MMHandSystem(cfg, axis_name=axis_name)
    state = system.init_state(jax.random.PRNGKey(0), local_batch_size=2)
    vgg = system.make_l1_loss(None).init_vgg(
        jax.random.PRNGKey(1), (1, cfg.model.fine_size, cfg.model.fine_size, 3))
    l1 = system.make_l1_loss(vgg)
    return system, state, l1


@pytest.mark.slow
class TestTrainStep:
    def test_step_runs_and_metrics_contract(self):
        cfg = _tiny_cfg()
        system, state, l1 = _make(cfg)
        step = jax.jit(make_train_step(system, l1))
        state, metrics = step(state, _batch(2), 2e-4)
        # loss-dict contract (reference get_current_errors MMHandModel.py:332-341)
        assert set(metrics) == {"pair_L1loss", "D_PP", "D_PB",
                                "pair_GANloss", "origin_L1", "perceptual"}
        assert all(np.isfinite(float(v)) for v in metrics.values())
        assert int(state.step) == 1

    def test_losses_improve_on_fixed_batch(self):
        cfg = _tiny_cfg()
        system, state, l1 = _make(cfg)
        step = jax.jit(make_train_step(system, l1))
        batch = _batch(2)
        first = None
        for i in range(8):
            state, metrics = step(state, batch, 1e-3)
            if first is None:
                first = metrics
        assert float(metrics["pair_L1loss"]) < float(first["pair_L1loss"])

    def test_dg_ratio_multiple_d_steps(self):
        cfg = _tiny_cfg(dg_ratio=2)
        system, state, l1 = _make(cfg)
        step = jax.jit(make_train_step(system, l1))
        state, metrics = step(state, _batch(2), 2e-4)
        # 2 D_PB pool queries x batch 2 -> 4 stored
        assert int(state.pool_pb.num) == 4

    def test_d_params_update(self):
        cfg = _tiny_cfg()
        system, state, l1 = _make(cfg)
        step = jax.jit(make_train_step(system, l1))
        before = jax.tree.leaves(state.d_pb.params)[0].copy()
        state, _ = step(state, _batch(2), 1e-3)
        after = jax.tree.leaves(state.d_pb.params)[0]
        assert not np.allclose(before, after)


@pytest.mark.slow
class TestShardedStep:
    def test_eight_way_dp_matches_contract(self):
        assert jax.device_count() == 8
        cfg = _tiny_cfg()
        system, state, l1 = _make(cfg, axis_name="data")
        mesh = make_mesh()
        step = make_sharded_train_step(system, l1, mesh)
        gstate = replicate_state_for_mesh(state, mesh)
        batch = shard_batch(_batch(16), mesh)
        gstate, metrics = step(gstate, batch, 2e-4)
        assert all(np.isfinite(float(v)) for v in metrics.values())
        # params stayed replicated: one step on each device, same values
        gstate, _ = step(gstate, batch, 2e-4)
        assert int(gstate.step) == 2
        # per-device pools filled independently
        assert gstate.pool_pb.images.shape[0] == 8
        np.testing.assert_array_equal(np.asarray(gstate.pool_pb.num),
                                      np.full(8, 4))

    def test_sync_bn_matches_full_batch(self):
        """Cross-replica BN: sharded G forward == single-device full-batch
        forward (dropout off).  This is the convert_syncbn_model parity
        check (mean of moments, not mean-of-means)."""
        from jax.sharding import PartitionSpec as P
        from mmhand_tpu.models import Generator, NormConfig

        mesh = make_mesh()
        g_sync = Generator(ngf=8, n_blocks=1, use_dropout=False,
                           norm=NormConfig(kind="batch", axis_name="data"),
                           dtype=jnp.float32)
        g_plain = Generator(ngf=8, n_blocks=1, use_dropout=False,
                            norm=NormConfig(kind="batch"), dtype=jnp.float32)
        # random inputs everywhere: constant channels have ~zero variance,
        # and 1/sqrt(var+eps) amplifies float noise into false mismatches
        x = (jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (8, 32, 32, 3)),
                         jnp.float32),
             jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (8, 32, 32, 42)),
                         jnp.float32),
             jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (8, 32, 32, 6)),
                         jnp.float32))
        variables = g_plain.init(jax.random.PRNGKey(0), x, train=False)

        full = g_plain.apply(variables, x, train=True,
                             mutable=["batch_stats"])[0]

        def fwd(v, xs):
            return g_sync.apply(v, xs, train=True, mutable=["batch_stats"])[0]

        sharded_fwd = jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data"),
            check_vma=False)
        sharded = sharded_fwd(variables, x)
        np.testing.assert_allclose(np.asarray(full), np.asarray(sharded),
                                   atol=1e-4)

    def test_sharded_step_equals_single_device_step(self):
        """Gradient-path parity: with dropout off and pool disabled, one
        8-way-sharded step must produce the same updated parameters as a
        single-device step on the same global batch (pmean of equal-size
        shard means == global mean; sync-BN == full-batch stats)."""
        from mmhand_tpu.config import LossConfig, PrecisionConfig

        # f32 compute: under bf16, reduction-order differences between the
        # sharded and full-batch programs flip Adam's normalized direction
        # on near-zero gradients (observed ~4% of elements off by one step)
        cfg = Config(
            model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8, ndf=8,
                              use_dropout_g=False, use_dropout_d=False),
            loss=LossConfig(l1_type="origin"),
            optim=OptimConfig(pool_size=0),
            precision=PrecisionConfig(compute_dtype="float32"))
        batch = _batch(16, seed=5)

        sys_single = MMHandSystem(cfg)
        state_s = sys_single.init_state(jax.random.PRNGKey(0), 2)
        step_s = jax.jit(make_train_step(sys_single, None))
        out_s, _ = step_s(state_s, batch, 1e-3)

        sys_dp = MMHandSystem(cfg, axis_name="data")
        mesh = make_mesh()
        state_d = sys_dp.init_state(jax.random.PRNGKey(0), 2)
        step_d = make_sharded_train_step(sys_dp, None, mesh)
        gstate = replicate_state_for_mesh(state_d, mesh)
        out_d, _ = step_d(gstate, shard_batch(batch, mesh), 1e-3)

        # Adam normalizes by sqrt(v): on near-zero gradients even f32
        # reduction-order noise flips the step direction for isolated
        # elements (observed 1/9216).  Assert near-total agreement plus a
        # hard bound of ~2 lr units on the stragglers.
        def check(tree_a, tree_b):
            a = np.concatenate([np.ravel(x) for x in jax.tree.leaves(tree_a)])
            b = np.concatenate([np.ravel(x) for x in jax.tree.leaves(tree_b)])
            diff = np.abs(a - b)
            assert np.mean(diff > 1e-5) < 1e-3, np.mean(diff > 1e-5)
            assert diff.max() < 2.5e-3, diff.max()

        check(out_s.g.params, out_d.g.params)
        check(out_s.d_pb.params, out_d.d_pb.params)
        check(out_s.d_pp.params, out_d.d_pp.params)


class TestPoolVectorizedEquivalence:
    """The one-pass vectorized pool_query must reproduce the sequential
    per-image reference policy (reference util/image_pool.py:14-34) draw
    for draw — verified against a python re-implementation that consumes
    the same fold_in(rng, i) key schedule."""

    def _sequential(self, images, num, batch, rng):
        import jax
        images = np.array(images)
        batch = np.asarray(batch, images.dtype)
        pool_size = images.shape[0]
        out = np.zeros_like(batch)
        num = int(num)
        for i in range(batch.shape[0]):
            key = jax.random.fold_in(rng, i)
            k_swap, k_idx = jax.random.split(key)
            if num < pool_size:
                images[num] = batch[i]
                out[i] = batch[i]
                num += 1
            else:
                p = float(jax.random.uniform(k_swap))
                rid = int(jax.random.randint(k_idx, (), 0, pool_size))
                if p > 0.5:
                    out[i] = images[rid]
                    images[rid] = batch[i]
                else:
                    out[i] = batch[i]
        return images, num, out

    @pytest.mark.parametrize("num0", [0, 2, 4])
    def test_matches_sequential(self, num0):
        import jax
        from mmhand_tpu.train.pool import PoolState, pool_query

        rng_np = np.random.RandomState(num0)
        pool_size, bsz = 4, 16  # small pool, large batch => many collisions
        images = jnp.asarray(
            rng_np.uniform(-1, 1, (pool_size, 8, 8, 3)), jnp.float32)
        if num0 < pool_size:  # unfilled slots are zeros
            images = images.at[num0:].set(0.0)
        batch = jnp.asarray(
            rng_np.uniform(-1, 1, (bsz, 8, 8, 3)), jnp.float32)
        key = jax.random.PRNGKey(17 + num0)

        state = PoolState(images=images, num=jnp.asarray(num0, jnp.int32))
        new_state, replayed = jax.jit(pool_query)(state, batch, key)
        want_imgs, want_num, want_out = self._sequential(
            images, num0, batch, key)

        assert int(new_state.num) == want_num
        np.testing.assert_allclose(np.asarray(new_state.images), want_imgs,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(replayed), want_out, atol=1e-6)


@pytest.mark.slow
class TestLossScaling:
    """PrecisionConfig.loss_scaling: the fp16-parity dynamic-scaling path
    (train/precision.py; reference models/MMHandModel.py:294-330 amp O1
    overflow vote).  Scales are powers of two, so each scale/unscale is
    exact in f32 — but XLA constant-folds the scale into adjacent ops
    (e.g. a mean's 1/N divisor), which reorders rounding, so the full
    step matches the unscaled one only to ~1e-5 relative."""

    def _cfg(self, loss_scaling):
        from mmhand_tpu.config import LossConfig, PrecisionConfig
        return Config(
            model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8, ndf=8,
                              use_dropout_g=False, use_dropout_d=False),
            loss=LossConfig(l1_type="origin"),
            optim=OptimConfig(pool_size=0),
            precision=PrecisionConfig(compute_dtype="float32",
                                      loss_scaling=loss_scaling))

    def _run(self, loss_scaling, batch, steps=2):
        system = MMHandSystem(self._cfg(loss_scaling))
        state = system.init_state(jax.random.PRNGKey(0), 2)
        step = jax.jit(make_train_step(system, None))
        metrics = None
        for _ in range(steps):
            state, metrics = step(state, batch, 2e-4)
        return state, metrics

    def test_no_overflow_matches_unscaled(self):
        """With no overflow, the scaled step reproduces the unscaled one
        to rounding-reorder tolerance (see class docstring), and the
        scalers grow their clean-step counters.

        The comparison is bulk + max-bound rather than elementwise-tight:
        the reorder noise on a gradient is ~1 f32 ulp, but Adam's update
        lr*g/(|g|+eps) has sensitivity ~lr/(4*eps) where |g|~eps, so an
        isolated near-eps gradient can turn ~1e-9 of grad noise into
        ~5e-6 of parameter difference (observed: 1 element / 9216).
        That is eps-region amplification of legitimate rounding noise,
        not a scaling bug; 99.9% of elements must still agree to
        (rtol 1e-5, atol 1e-7) and no element may move more than 1e-4
        (~lr/2 — the bound a single eps-region element can legitimately
        reach; observed 4.4e-5 on this host, r5)."""
        batch = _batch(2)
        s0, m0 = self._run(False, batch)
        s1, m1 = self._run(True, batch)
        n_ok = n_tot = 0
        for a, b in zip(jax.tree.leaves((s0.g, s0.d_pb, s0.d_pp)),
                        jax.tree.leaves((s1.g, s1.d_pb, s1.d_pp))):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            diff = np.abs(a - b)
            ok = diff <= 1e-7 + 1e-5 * np.abs(b)
            # bulk fraction is GLOBAL: a single eps-region element inside
            # a 32-wide bias vector must not fail a per-leaf ratio
            n_ok += int(ok.sum())
            n_tot += ok.size
            assert diff.max() < 1e-4, diff.max()
        assert n_ok / n_tot >= 0.999, (n_ok, n_tot)
        assert m1["amp_overflow"] == 0.0
        assert "amp_overflow" not in m0  # default 6-key contract untouched
        for k in ("g", "d_pp", "d_pb"):
            assert float(s1.scales[k].scale) == 2.0 ** 16
            assert int(s1.scales[k].growth_count) == 2

    def test_overflow_skips_all_later_updates(self):
        """A G-phase overflow skips the G update AND both D updates (the
        sticky self.overflow, reference :315-328), backs off only G's
        scale, and still applies the BN batch-stat updates (torch running
        stats update during forward regardless of optimizer.step)."""
        from mmhand_tpu.train.precision import LossScaleState
        system = MMHandSystem(self._cfg(True))
        state = system.init_state(jax.random.PRNGKey(0), 2)
        # near-f32-max G scale + a loss > 1 (H2=3 is outside tanh range,
        # so pair_L1 ~ 3) forces inf in the scaled G gradients
        big = LossScaleState(scale=jnp.asarray(3.0e38, jnp.float32),
                             growth_count=jnp.zeros((), jnp.int32))
        state = state.replace(scales=dict(state.scales, g=big))
        batch = _batch(2)
        batch["H2"] = jnp.full_like(batch["H2"], 3.0)

        step = jax.jit(make_train_step(system, None))
        out, metrics = step(state, batch, 2e-4)

        assert metrics["amp_overflow"] == 1.0
        for a, b in zip(jax.tree.leaves((state.g.params, state.d_pb.params,
                                         state.d_pp.params, state.opt_g)),
                        jax.tree.leaves((out.g.params, out.d_pb.params,
                                         out.d_pp.params, out.opt_g))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # G scale backed off; D scales untouched (their grads were finite)
        assert float(out.scales["g"].scale) == pytest.approx(1.5e38)
        assert int(out.scales["g"].growth_count) == 0
        for k in ("d_pp", "d_pb"):
            assert float(out.scales[k].scale) == 2.0 ** 16
            assert int(out.scales[k].growth_count) == 1
        # BN batch stats DID update (forward ran)
        stats0 = np.concatenate([np.ravel(x)
                                 for x in jax.tree.leaves(state.g.batch_stats)])
        stats1 = np.concatenate([np.ravel(x)
                                 for x in jax.tree.leaves(out.g.batch_stats)])
        assert not np.array_equal(stats0, stats1)

    def test_update_scale_growth_and_backoff(self):
        from mmhand_tpu.train import precision as amp
        s = amp.init_scale(2.0 ** 10)
        no, yes = jnp.asarray(False), jnp.asarray(True)
        for _ in range(amp.GROWTH_INTERVAL - 1):
            s = amp.update_scale(s, no)
        assert float(s.scale) == 2.0 ** 10
        s = amp.update_scale(s, no)  # GROWTH_INTERVAL-th clean step
        assert float(s.scale) == 2.0 ** 11
        assert int(s.growth_count) == 0
        s = amp.update_scale(s, yes)
        assert float(s.scale) == 2.0 ** 10
        # floor at 1
        s = amp.init_scale(1.0)
        s = amp.update_scale(s, yes)
        assert float(s.scale) == 1.0
