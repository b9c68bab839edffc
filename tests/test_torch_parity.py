"""Numerical forward parity vs the reference PyTorch models.

Builds the reference torch Generator/Discriminator with random weights,
converts the state_dict with tools/convert_mmhand_torch.py, and compares
eval-mode forwards on identical inputs.  This is the 'bit-comparable'
check for weight interchange (BASELINE.md)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from convert_mmhand_torch import (  # noqa: E402
    convert_discriminator,
    convert_generator,
)
from mmhand_tpu.models import Discriminator, Generator, NormConfig  # noqa: E402

torch = pytest.importorskip("torch")


def _torch_norm():
    import functools

    import torch.nn as tnn
    return functools.partial(tnn.BatchNorm2d, affine=True)


def _nchw(x):
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestGeneratorParity:
    @pytest.mark.parametrize("use_dropout", [True, False])
    def test_forward_matches_reference(self, use_dropout):
        from models.Generator import Generator as TorchG

        ngf, blocks, size = 8, 2, 32
        tg = TorchG([3, 42, 6], 3, ngf, norm_layer=_torch_norm(),
                    use_dropout=use_dropout, n_blocks=blocks).eval()
        variables = convert_generator(tg.state_dict())

        g = Generator(ngf=ngf, n_blocks=blocks, use_dropout=use_dropout,
                      norm=NormConfig(kind="batch"), dtype=jnp.float32)

        rng = np.random.RandomState(0)
        x1 = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
        x2 = rng.uniform(-1, 1, (2, size, size, 42)).astype(np.float32)
        x3 = rng.uniform(-1, 1, (2, size, size, 6)).astype(np.float32)

        with torch.no_grad():
            want = _nhwc(tg([_nchw(x1), _nchw(x2), _nchw(x3)]))
        got = np.asarray(g.apply(
            variables, (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(x3)),
            train=False))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_converted_tree_matches_init_structure(self):
        from models.Generator import Generator as TorchG

        tg = TorchG([3, 42, 6], 3, 8, norm_layer=_torch_norm(),
                    use_dropout=True, n_blocks=2)
        variables = convert_generator(tg.state_dict())
        g = Generator(ngf=8, n_blocks=2, dtype=jnp.float32)
        ref = g.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)},
                     (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 42)),
                      jnp.zeros((1, 32, 32, 6))), train=False)

        def paths(tree):
            return {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_flatten_with_path(tree)[0]}

        assert paths(ref["params"]) == paths(variables["params"])
        assert paths(ref["batch_stats"]) == paths(variables["batch_stats"])


class TestDiscriminatorParity:
    def test_forward_matches_reference(self):
        from models.Discriminator import Discriminator as TorchD

        ndf, blocks, size = 8, 2, 32
        td = TorchD(6, ndf, norm_layer=_torch_norm(), use_dropout=True,
                    n_blocks=blocks).eval()
        variables = convert_discriminator(td.state_dict())

        d = Discriminator(ndf=ndf, n_blocks=blocks, use_dropout=True,
                          norm=NormConfig(kind="batch"), dtype=jnp.float32)
        rng = np.random.RandomState(1)
        x = rng.uniform(-1, 1, (2, size, size, 6)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(td(_nchw(x)))
        got = np.asarray(d.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, atol=2e-5)


def _import_reference_cpm(name):
    """Import the standalone reference CPM net file from a runtime temp copy
    (the package's __init__ pulls apex; the net files themselves are
    torch-only)."""
    import importlib.util
    import shutil
    import tempfile

    src = ("/root/reference/baselines/quantitative_on_benchmarks/networks/"
           f"{name}.py")
    tmp = tempfile.mkdtemp(prefix="refcpm_")
    dst = shutil.copy(src, tmp)
    spec = importlib.util.spec_from_file_location(name, dst)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestCPMParity:
    def test_hpm2d_forward_matches_reference(self):
        TorchHpm2d = _import_reference_cpm("net_hpm2d").Hpm2d
        from mmhand_tpu.models.cpm import Hpm2d, load_cpm_state_dict

        t = TorchHpm2d(21, 3, False).eval()
        variables = load_cpm_state_dict(t.state_dict())
        net = Hpm2d(21, dtype=jnp.float32)

        rng = np.random.RandomState(0)
        x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = [_nhwc(o) for o in t(_nchw(x))]
        got = net.apply(variables, jnp.asarray(x))
        assert len(got) == len(want) == 6
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, atol=3e-4)

    def test_hpm3d_forward_matches_reference(self):
        TorchHpm3d = _import_reference_cpm("net_hpm3d").Hpm3d
        from mmhand_tpu.models.cpm import Hpm3d, load_cpm_state_dict

        t = TorchHpm3d(21, 21).eval()
        variables = load_cpm_state_dict(t.state_dict())
        net = Hpm3d(21, dtype=jnp.float32)

        rng = np.random.RandomState(1)
        # the depth FC is sized for 256px inputs (21*32*32 flatten)
        x = rng.uniform(0, 1, (1, 256, 256, 21)).astype(np.float32)
        with torch.no_grad():
            want = t(_nchw(x).contiguous()).numpy()
        got = np.asarray(net.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=3e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# Trainer-update parity: the full optimize_parameters math vs torch.
#
# Drives the reference's own modules (Generator, Discriminator, GANLoss,
# L1_plus_perceptualLoss, ImagePool) plus torch.optim.Adam through three
# steps in the exact reference order (reference models/MMHandModel.py:
# 310-330 — G step, then DG_ratio x D_PP, then DG_ratio x D_PB, D phases on
# the pre-update fakes), and asserts the jax train step reproduces, from
# converted initial weights:
#   * all six loss-dict values every step (get_current_errors :332-341),
#   * the G/D_PB/D_PP gradients of step 1,
#   * the post-Adam parameters after 3 steps.
# Dropout off, pool_size 0 (pool passthrough, util/image_pool.py:15-16),
# both sides f32, shared random-weight VGG for the perceptual term.
#
# Known deliberate divergence NOT asserted here: D running batch-stats
# (torch also updates them during backward_G's D forwards; train-mode
# normalization uses batch stats so losses/grads/params are unaffected),
# and running_var bias (torch stores the unbiased batch variance in
# running_var, flax stores the biased one — relative gap 1/(N-1) for
# N = B*H*W; G running means are asserted exactly).
# ---------------------------------------------------------------------------


def _install_torchvision_stub(vgg_features):
    """No torchvision in this environment; the reference loss imports
    torchvision.models at module import and calls models.vgg19(...).features
    (reference losses/L1_plus_perceptualLoss.py:6,22).  Serve `vgg_features`
    through a stub so the reference loss code runs unmodified."""
    import types

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg19 = lambda pretrained=True, **kw: types.SimpleNamespace(
        features=vgg_features)
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


class _PassthroughDP(object):
    """CPU stand-in for nn.DataParallel (CUDA-only); forwards to the
    wrapped module — the reference wraps only its frozen VGG submodel in it
    (reference losses/L1_plus_perceptualLoss.py:28-30)."""

    def __new__(cls, module, device_ids=None):
        return module


class _RefTrainer:
    """The reference update math, verbatim order (reference
    models/MMHandModel.py:215-221 forward, :236-261 backward_G, :263-292
    backward_D_basic/_PP/_PB, :310-330 optimize_parameters)."""

    def __init__(self, netG, netD_PB, netD_PP, crit_gan, crit_l1,
                 lambda_gan, lr, beta1, dg_ratio=1):
        from util.image_pool import ImagePool

        self.netG, self.netD_PB, self.netD_PP = netG, netD_PB, netD_PP
        self.crit_gan, self.crit_l1 = crit_gan, crit_l1
        self.lambda_gan, self.dg_ratio = lambda_gan, dg_ratio
        adam = lambda net: torch.optim.Adam(
            net.parameters(), lr=lr, betas=(beta1, 0.999))
        self.opt_G, self.opt_D_PB, self.opt_D_PP = (
            adam(netG), adam(netD_PB), adam(netD_PP))
        self.fake_PB_pool = ImagePool(0)
        self.fake_PP_pool = ImagePool(0)

    @staticmethod
    def _grads(net):
        return {k: p.grad.detach().clone()
                for k, p in net.named_parameters()}

    def _d_basic(self, netD, real, fake):
        # reference backward_D_basic :263-271 (loss_backward at :273 is
        # plain .backward() in the non-distributed branch :307-308)
        pred_real = netD(real)
        loss_D_real = self.crit_gan(pred_real, True) * self.lambda_gan
        pred_fake = netD(fake.detach())
        loss_D_fake = self.crit_gan(pred_fake, False) * self.lambda_gan
        return (loss_D_real + loss_D_fake) * 0.5

    def step(self, b):
        """One optimize_parameters; returns (errors, step-1-style grads)."""
        H1, P1, D1 = b["H1"], b["P1"], b["D1"]
        H2, P2, D2 = b["H2"], b["P2"], b["D2"]
        errors, grads = {}, {}
        # forward :215-221
        fake_p2 = self.netG([H1, torch.cat((P1, P2), 1),
                             torch.cat((D1, D2), 1)])
        # G :314-316, backward_G :236-261
        self.opt_G.zero_grad()
        pred_fake_PB = self.netD_PB(torch.cat((fake_p2, P2), 1))
        loss_G_GAN_PB = self.crit_gan(pred_fake_PB, True)
        pred_fake_PP = self.netD_PP(torch.cat((fake_p2, H1), 1))
        loss_G_GAN_PP = self.crit_gan(pred_fake_PP, True)
        losses = self.crit_l1(fake_p2, H2)
        pair_L1loss = losses[0]
        pair_GANloss = (loss_G_GAN_PB * self.lambda_gan
                        + loss_G_GAN_PP * self.lambda_gan) / 2
        (pair_L1loss + pair_GANloss).backward()
        grads["g"] = self._grads(self.netG)
        self.opt_G.step()
        errors.update(
            pair_L1loss=pair_L1loss.item(), pair_GANloss=pair_GANloss.item(),
            origin_L1=losses[1].item(), perceptual=losses[2].item())
        # D_PP :318-322, backward_D_PP :286-292
        for _ in range(self.dg_ratio):
            self.opt_D_PP.zero_grad()
            real_PP = torch.cat((H2, H1), 1)
            fake_PP = self.fake_PP_pool.query(
                torch.cat((fake_p2, H1), 1).data)
            loss_D_PP = self._d_basic(self.netD_PP, real_PP, fake_PP)
            loss_D_PP.backward()
            grads["d_pp"] = self._grads(self.netD_PP)
            self.opt_D_PP.step()
            errors["D_PP"] = loss_D_PP.item()
        # D_PB :324-328, backward_D_PB :277-283
        for _ in range(self.dg_ratio):
            self.opt_D_PB.zero_grad()
            real_PB = torch.cat((H2, P2), 1)
            fake_PB = self.fake_PB_pool.query(
                torch.cat((fake_p2, P2), 1).data)
            loss_D_PB = self._d_basic(self.netD_PB, real_PB, fake_PB)
            loss_D_PB.backward()
            grads["d_pb"] = self._grads(self.netD_PB)
            self.opt_D_PB.step()
            errors["D_PB"] = loss_D_PB.item()
        return errors, grads


def _grads_as_state_dict(net, grads):
    """state_dict with parameter entries replaced by their gradients, so the
    proven weight converters map torch grads onto the flax tree layout."""
    sd = {k: v.clone() for k, v in net.state_dict().items()}
    sd.update(grads)
    return sd


def _assert_trees_close(got, want, rtol, atol, what):
    got_flat = jax.tree_util.tree_flatten_with_path(got)[0]
    want_flat = dict(jax.tree_util.tree_flatten_with_path(want)[0])
    assert len(got_flat) == len(want_flat), what
    for path, g in got_flat:
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(want_flat[path], np.float32),
            rtol=rtol, atol=atol, err_msg=f"{what}{jax.tree_util.keystr(path)}")


@pytest.mark.slow
class TestTrainerUpdateParity:
    B, SIZE, NGF, BLOCKS = 2, 32, 8, 2
    LAM_GAN, LAM_A, LAM_B, LR, BETA1 = 5.0, 10.0, 10.0, 2e-4, 0.5

    def _batch(self, seed):
        r = np.random.RandomState(seed)
        b, s = self.B, self.SIZE
        mk = lambda c, lo: r.uniform(lo, 1, (b, s, s, c)).astype(np.float32)
        return {"H1": mk(3, -1), "P1": mk(21, 0), "D1": mk(3, -1),
                "H2": mk(3, -1), "P2": mk(21, 0), "D2": mk(3, -1)}

    def _build_torch(self, monkeypatch):
        from models.Discriminator import Discriminator as TorchD
        from models.Generator import Generator as TorchG
        from models.network_utils import GANLoss

        torch.manual_seed(0)
        import torch.nn as tnn
        # stub VGG19 features: real vgg19 layout through the truncation
        # index 3 (conv,relu,conv,relu | pool), random weights shared with
        # the jax side
        feats = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.MaxPool2d(2, 2))
        _install_torchvision_stub(feats)
        monkeypatch.setattr(torch.nn, "DataParallel", _PassthroughDP)
        from losses.L1_plus_perceptualLoss import L1_plus_perceptualLoss

        netG = TorchG([3, 42, 6], 3, self.NGF, norm_layer=_torch_norm(),
                      use_dropout=False, n_blocks=self.BLOCKS)
        mk_d = lambda nc: TorchD(nc, self.NGF, norm_layer=_torch_norm(),
                                 use_dropout=False, n_blocks=self.BLOCKS,
                                 padding_type="reflect", use_sigmoid=False,
                                 n_downsampling=2)
        netD_PB, netD_PP = mk_d(24), mk_d(6)
        crit_gan = GANLoss(use_lsgan=False, gpu="cpu")
        crit_l1 = L1_plus_perceptualLoss(
            self.LAM_A, self.LAM_B, perceptual_layers=3,
            gpu_ids=["cpu"], percep_is_l1=1)
        trainer = _RefTrainer(netG, netD_PB, netD_PP, crit_gan, crit_l1,
                              self.LAM_GAN, self.LR, self.BETA1)
        vgg_vars = {"params": {
            f"conv{i}": {
                "kernel": np.transpose(
                    feats[i].weight.detach().numpy(), (2, 3, 1, 0)),
                "bias": feats[i].bias.detach().numpy()}
            for i in (0, 2)}}
        return trainer, vgg_vars

    def _build_jax(self, trainer, vgg_vars, tx=None):
        from mmhand_tpu.config import (Config, LossConfig, ModelConfig,
                                       OptimConfig, PrecisionConfig)
        from mmhand_tpu.train.state import MMHandSystem, NetState
        from mmhand_tpu.train.step import make_train_step

        cfg = Config(
            model=ModelConfig(ngf=self.NGF, ndf=self.NGF,
                              g_n_blocks=self.BLOCKS,
                              n_layers_d=self.BLOCKS, fine_size=self.SIZE,
                              use_dropout_g=False, use_dropout_d=False),
            loss=LossConfig(lambda_a=self.LAM_A, lambda_b=self.LAM_B,
                            lambda_gan=self.LAM_GAN),
            optim=OptimConfig(lr=self.LR, beta1=self.BETA1, pool_size=0),
            precision=PrecisionConfig(compute_dtype="float32"))
        system = MMHandSystem(cfg)
        if tx is not None:
            object.__setattr__(system, "tx", tx)
        gv = convert_generator(trainer.netG.state_dict())
        pbv = convert_discriminator(trainer.netD_PB.state_dict())
        ppv = convert_discriminator(trainer.netD_PP.state_dict())
        state = system.init_state(jax.random.PRNGKey(0),
                                  local_batch_size=self.B)
        state = state.replace(
            g=NetState(gv["params"], gv["batch_stats"]),
            d_pb=NetState(pbv["params"], pbv["batch_stats"]),
            d_pp=NetState(ppv["params"], ppv["batch_stats"]),
            opt_g=system.tx.init(gv["params"]),
            opt_d_pb=system.tx.init(pbv["params"]),
            opt_d_pp=system.tx.init(ppv["params"]))
        step = jax.jit(make_train_step(system, system.make_l1_loss(vgg_vars)))
        return state, step

    def test_losses_and_params_over_three_steps(self, monkeypatch):
        trainer, vgg_vars = self._build_torch(monkeypatch)
        state, step = self._build_jax(trainer, vgg_vars)
        for i in range(3):
            b = self._batch(100 + i)
            want, _ = trainer.step(
                {k: _nchw(v) for k, v in b.items()})
            state, metrics = step(state, {k: jnp.asarray(v)
                                          for k, v in b.items()}, self.LR)
            for key, ref in want.items():
                got = float(metrics[key])
                np.testing.assert_allclose(
                    got, ref, rtol=2e-4, atol=2e-4,
                    err_msg=f"step {i} loss {key}")
        g_want = convert_generator(trainer.netG.state_dict())
        _assert_trees_close(state.g.params, g_want["params"],
                            rtol=1e-3, atol=2e-5, what="G params")
        # G running means update identically (momentum .1, one G forward
        # per step on both sides); running vars differ by the documented
        # unbiased/biased factor N/(N-1), N=B*H*W — assert within that.
        want_stats = g_want["batch_stats"]
        got_means = jax.tree.map(lambda x: x, state.g.batch_stats)
        means_got = {p: v for p, v in
                     jax.tree_util.tree_flatten_with_path(got_means)[0]
                     if "mean" in jax.tree_util.keystr(p)}
        means_want = {p: v for p, v in
                      jax.tree_util.tree_flatten_with_path(want_stats)[0]
                      if "mean" in jax.tree_util.keystr(p)}
        for p, v in means_got.items():
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(means_want[p], np.float32),
                rtol=1e-3, atol=1e-5,
                err_msg=f"G running mean {jax.tree_util.keystr(p)}")
        for name, net in (("D_PB", trainer.netD_PB),
                          ("D_PP", trainer.netD_PP)):
            want = convert_discriminator(net.state_dict())["params"]
            got = state.d_pb.params if name == "D_PB" else state.d_pp.params
            _assert_trees_close(got, want, rtol=1e-3, atol=2e-5,
                                what=f"{name} params")

    def test_step1_gradients(self, monkeypatch):
        import optax

        trainer, vgg_vars = self._build_torch(monkeypatch)
        # tx = plain descent at lr 1.0 => param delta == -grad, exposing the
        # step's gradients without touching its code path
        state, step = self._build_jax(trainer, vgg_vars, tx=optax.sgd(1.0))
        # np.array (copy), NOT np.asarray: on CPU the latter is a zero-copy
        # view into the jax buffer, which dies when `state` is rebound below
        p0 = jax.tree.map(lambda v: np.array(v),
                          {"g": state.g.params, "d_pb": state.d_pb.params,
                           "d_pp": state.d_pp.params})
        b = self._batch(100)
        _, grads = trainer.step({k: _nchw(v) for k, v in b.items()})
        state, _ = step(state, {k: jnp.asarray(v) for k, v in b.items()}, 1.0)
        p1 = {"g": state.g.params, "d_pb": state.d_pb.params,
              "d_pp": state.d_pp.params}
        got = jax.tree.map(lambda a, z: np.asarray(a) - np.asarray(z),
                           p0, jax.tree.map(np.asarray, p1))
        conv = {"g": lambda sd: convert_generator(sd)["params"],
                "d_pb": lambda sd: convert_discriminator(sd)["params"],
                "d_pp": lambda sd: convert_discriminator(sd)["params"]}
        nets = {"g": trainer.netG, "d_pb": trainer.netD_PB,
                "d_pp": trainer.netD_PP}
        for which in ("g", "d_pb", "d_pp"):
            want = conv[which](
                _grads_as_state_dict(nets[which], grads[which]))
            _assert_trees_close(got[which], want, rtol=1e-3, atol=1e-5,
                                what=f"{which} grads")
