"""Golden tests: LR schedules vs torch schedulers, --init_type variants
(VERDICT r1 item 6; reference models/network_utils.py:23-71, 87-109)."""

import numpy as np
import pytest

from mmhand_tpu.config import Config, ModelConfig, OptimConfig
from mmhand_tpu.train.step import LRSchedule, lr_for_epoch


def _torch_lrs(policy, epochs, metrics=None, lr=2e-4, niter=10,
               niter_decay=5, epoch_count=1, lr_decay_iters=3):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr)
    if policy == "lambda":
        lam = lambda epoch: 1.0 - max(
            0, epoch + 1 + epoch_count - niter) / float(niter_decay + 1)
        sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lam)
    elif policy == "step":
        sched = torch.optim.lr_scheduler.StepLR(
            opt, step_size=lr_decay_iters, gamma=0.1)
    else:
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.2, threshold=0.01, patience=5)
    out = []
    for e in range(epochs):
        out.append(opt.param_groups[0]["lr"])
        if policy == "plateau":
            sched.step(metrics[e])
        else:
            sched.step()
    return out


class TestLRPolicies:
    def _cfg(self, policy):
        return Config(optim=OptimConfig(
            lr=2e-4, lr_policy=policy, niter=10, niter_decay=5,
            epoch_count=1, lr_decay_iters=3))

    def test_lambda_matches_torch(self):
        cfg = self._cfg("lambda")
        torch_lrs = _torch_lrs("lambda", 16)
        ours = [lr_for_epoch(cfg, e) for e in range(16)]
        np.testing.assert_allclose(ours, torch_lrs, rtol=1e-12)

    def test_step_matches_torch(self):
        cfg = self._cfg("step")
        torch_lrs = _torch_lrs("step", 10)
        ours = [lr_for_epoch(cfg, e) for e in range(10)]
        np.testing.assert_allclose(ours, torch_lrs, rtol=1e-12)

    def test_plateau_matches_torch(self):
        # improving for 3 epochs, then stuck for 10, then improving again
        metrics = [10.0, 9.0, 8.0] + [8.0] * 10 + [4.0, 3.5, 3.5, 3.5]
        cfg = self._cfg("plateau")
        torch_lrs = _torch_lrs("plateau", len(metrics), metrics=metrics)
        sched = LRSchedule(cfg)
        ours = []
        prev = None
        for e in range(len(metrics)):
            ours.append(sched.epoch_lr(e, prev))
            prev = metrics[e]
        np.testing.assert_allclose(ours, torch_lrs, rtol=1e-12)

    def test_plateau_state_roundtrip(self):
        cfg = self._cfg("plateau")
        s1 = LRSchedule(cfg)
        for e, m in enumerate([5.0, 5.0, 5.0, 5.0]):
            s1.epoch_lr(e, m)
        s2 = LRSchedule(cfg)
        s2.load_state_dict(s1.state_dict())
        assert s2.epoch_lr(4, 5.0) == s1.epoch_lr(4, 5.0)

    def test_unknown_policy_raises(self):
        with pytest.raises(NotImplementedError):
            LRSchedule(self._cfg("cosine"))


class TestInitTypes:
    """reference models/network_utils.py:23-71: xavier_normal(gain=.02),
    kaiming_normal(fan_in, a=0), orthogonal(gain=1); norm params untouched."""

    def _params(self, init_type):
        import jax
        from mmhand_tpu.models.discriminator import Discriminator
        from mmhand_tpu.models.layers import NormConfig, apply_init_type

        d = Discriminator(ndf=32, n_blocks=1, norm=NormConfig())
        variables = d.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 32, 32, 6), np.float32), train=False)
        return apply_init_type(variables["params"], init_type,
                               jax.random.PRNGKey(1)), variables["params"]

    def _kernels(self, params):
        import jax
        out = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = path[-1].key
            if name == "kernel" and leaf.ndim == 4:
                out.append((leaf, path))
        return out

    def test_normal_is_noop(self):
        import jax
        new, old = self._params("normal")
        assert all(np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(new), jax.tree.leaves(old)))

    def test_xavier_std(self):
        new, _ = self._params("xavier")
        for k, _path in self._kernels(new):
            kh, kw, cin, cout = k.shape
            expected = 0.02 * np.sqrt(2.0 / (cin * kh * kw + cout * kh * kw))
            assert np.std(np.asarray(k)) == pytest.approx(
                expected, rel=0.35)

    def test_kaiming_std(self):
        new, _ = self._params("kaiming")
        for k, _path in self._kernels(new):
            kh, kw, cin, cout = k.shape
            expected = np.sqrt(2.0 / (cin * kh * kw))
            assert np.std(np.asarray(k)) == pytest.approx(expected, rel=0.35)

    def test_orthogonal_semi_orthogonality(self):
        new, _ = self._params("orthogonal")
        for k, _path in self._kernels(new):
            kh, kw, cin, cout = k.shape
            # torch layout: W (cout, cin*kh*kw) semi-orthogonal
            w = np.asarray(k).transpose(3, 2, 0, 1).reshape(cout, -1)
            if cout <= w.shape[1]:
                gram = w @ w.T
            else:
                gram = w.T @ w
            np.testing.assert_allclose(gram, np.eye(gram.shape[0]),
                                       atol=1e-4)

    def test_norm_scale_untouched(self):
        import jax
        new, old = self._params("xavier")
        flat_new = dict(jax.tree_util.tree_flatten_with_path(new)[0])
        for path, leaf in jax.tree_util.tree_flatten_with_path(old)[0]:
            if path[-1].key in ("scale", "bias"):
                np.testing.assert_array_equal(flat_new[path], leaf)

    def test_unknown_init_raises(self):
        with pytest.raises(NotImplementedError):
            self._params("lecun")

    def test_wired_into_init_state(self):
        import jax
        from mmhand_tpu.train.state import MMHandSystem
        cfg = Config(model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8,
                                       ndf=8, init_type="orthogonal"))
        system = MMHandSystem(cfg)
        state = system.init_state(jax.random.PRNGKey(0), local_batch_size=1)
        k = state.g.params["stream1_in"]["PadConv_0"]["kernel"]
        kh, kw, cin, cout = k.shape
        w = np.asarray(k).transpose(3, 2, 0, 1).reshape(cout, -1)
        gram = w @ w.T if cout <= w.shape[1] else w.T @ w
        np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-4)
