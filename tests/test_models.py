"""Model-zoo parity tests: parameter counts match the reference torch models
exactly (goldens measured from the reference architecture), shapes/dtypes
are TPU-native NHWC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmhand_tpu.models import Discriminator, Generator, NormConfig

# Golden parameter counts measured from the reference torch models
# (models/Generator.py, models/Discriminator.py with batch norm, defaults:
# G([3,42,6], ngf=64, 9 blocks), D(24ch)/D(6ch) with ndf=64, 3 blocks).
G_PARAMS = 71_272_835
D_PB_PARAMS = 3_986_816
D_PP_PARAMS = 3_930_368


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def rngs():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": jax.random.fold_in(k, 1)}


class TestGenerator:
    def test_param_count_parity(self, rngs):
        g = Generator()
        x = (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 42)),
             jnp.zeros((1, 64, 64, 6)))
        variables = g.init(rngs, x, train=False)
        assert _count(variables["params"]) == G_PARAMS

    def test_forward_shape_and_range(self, rngs):
        g = Generator(ngf=16, n_blocks=2)
        x = (jnp.ones((2, 64, 64, 3)), jnp.ones((2, 64, 64, 42)),
             jnp.ones((2, 64, 64, 6)))
        variables = g.init(rngs, x, train=False)
        out = g.apply(variables, x, train=False)
        assert out.shape == (2, 64, 64, 3)
        assert out.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh output

    def test_train_mode_updates_batch_stats(self, rngs):
        g = Generator(ngf=8, n_blocks=1)
        x = (jnp.ones((2, 32, 32, 3)), jnp.ones((2, 32, 32, 42)),
             jnp.ones((2, 32, 32, 6)))
        variables = g.init(rngs, x, train=False)
        _, new_vars = g.apply(variables, x, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": rngs["dropout"]})
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(new_vars["batch_stats"])
        assert any(not np.allclose(o, n) for o, n in zip(old, new))

    def test_instance_norm_variant(self, rngs):
        g = Generator(ngf=8, n_blocks=1, norm=NormConfig(kind="instance"))
        x = (jnp.ones((1, 32, 32, 3)), jnp.ones((1, 32, 32, 42)),
             jnp.ones((1, 32, 32, 6)))
        variables = g.init(rngs, x, train=False)
        assert "batch_stats" not in variables
        out = g.apply(variables, x, train=False)
        assert out.shape == (1, 32, 32, 3)


class TestDiscriminator:
    def test_param_count_parity_pb(self, rngs):
        d = Discriminator()
        v = d.init({"params": rngs["params"]},
                   jnp.zeros((1, 64, 64, 24)), train=False)
        assert _count(v["params"]) == D_PB_PARAMS

    def test_param_count_parity_pp(self, rngs):
        d = Discriminator()
        v = d.init({"params": rngs["params"]},
                   jnp.zeros((1, 64, 64, 6)), train=False)
        assert _count(v["params"]) == D_PP_PARAMS

    def test_feature_map_logits_no_projection(self, rngs):
        """The reference D has NO final 1-channel head: output is the full
        ndf*4 feature map (reference Discriminator.py:135-151)."""
        d = Discriminator(ndf=16)
        v = d.init({"params": rngs["params"]},
                   jnp.zeros((2, 64, 64, 6)), train=False)
        out = d.apply(v, jnp.zeros((2, 64, 64, 6)), train=False)
        assert out.shape == (2, 16, 16, 64)  # H/4, W/4, ndf*4

    def test_three_downsample_special_case(self, rngs):
        d = Discriminator(ndf=16, n_downsampling=3)
        v = d.init({"params": rngs["params"]},
                   jnp.zeros((1, 64, 64, 6)), train=False)
        out = d.apply(v, jnp.zeros((1, 64, 64, 6)), train=False)
        assert out.shape == (1, 8, 8, 64)  # H/8, width stays ndf*4


class TestWeightInit:
    def test_conv_kernels_are_n002(self, rngs):
        g = Generator(ngf=64, n_blocks=1)
        x = (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 42)),
             jnp.zeros((1, 32, 32, 6)))
        variables = g.init(rngs, x, train=False)
        kernels = [p for path, p in
                   jax.tree_util.tree_flatten_with_path(variables["params"])[0]
                   if "kernel" in str(path)]
        big = np.concatenate([np.ravel(k) for k in kernels if k.size > 1000])
        assert abs(float(big.std()) - 0.02) < 0.002
        assert abs(float(big.mean())) < 0.001


class TestUpConvDecomposition:
    """UpConv(3,2,1,1) parity-decomposed pixel-shuffle == the lhs-dilated
    ConvTranspose formulation (exactness of the fast path)."""

    def test_matches_dilated_form(self):
        import jax
        import jax.numpy as jnp
        from mmhand_tpu.models.layers import _upconv3_pixel_shuffle

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 9, 7, 5)), jnp.float32)
        w = jnp.asarray(rng.uniform(-1, 1, (3, 3, 5, 4)), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = _upconv3_pixel_shuffle(x, w)
        assert got.shape == want.shape == (2, 18, 14, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_general_geometry_k4(self):
        """UpConv(k4 s2 p1 op0) — the UNet/PoseResNet deconv — matches
        torch ConvTranspose2d geometry (2x upsample)."""
        import jax
        import jax.numpy as jnp
        from mmhand_tpu.models.layers import UpConv

        m = UpConv(4, kernel_size=4, stride=2, padding=1, output_padding=0,
                   dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        y = m.apply(v, jnp.zeros((1, 8, 8, 3)))
        assert y.shape == (1, 16, 16, 4)


@pytest.mark.slow
class TestFusedStems:
    """Generator(stem_fused=1) (ModelConfig.g_stem_fused): one
    block-diagonal 7x7 conv for the three stems — identical param tree and
    (near-bit) identical outputs."""

    def _small_g(self, stem_fused=0):
        return Generator(ngf=16, n_blocks=2, n_downsampling=2,
                         norm=NormConfig(kind="batch"), use_dropout=False,
                         dtype=jnp.float32, stem_fused=stem_fused)

    def test_fused_matches_unfused(self, rngs):
        g0, g1 = self._small_g(0), self._small_g(1)
        b = 2
        inp = (jnp.asarray(np.random.RandomState(0)
                           .normal(size=(b, 64, 64, 3)), jnp.float32),
               jnp.asarray(np.random.RandomState(1)
                           .normal(size=(b, 64, 64, 42)), jnp.float32),
               jnp.asarray(np.random.RandomState(2)
                           .normal(size=(b, 64, 64, 6)), jnp.float32))
        vs = g0.init(rngs, inp, train=False)
        y0 = g0.apply(vs, inp, train=False)
        vs1 = g1.init(rngs, inp, train=False)
        assert (jax.tree_util.tree_structure(vs)
                == jax.tree_util.tree_structure(vs1))
        for a, c in zip(jax.tree.leaves(vs), jax.tree.leaves(vs1)):
            assert a.shape == c.shape
        y1 = g1.apply(vs, inp, train=False)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-4, atol=1e-4)

    def test_fused_gradients_match(self, rngs):
        g0, g1 = self._small_g(0), self._small_g(1)
        inp = tuple(
            jnp.asarray(np.random.RandomState(i).normal(size=(1, 32, 32, c)),
                        jnp.float32) for i, c in enumerate((3, 42, 6)))
        vs = g0.init(rngs, inp, train=False)

        def loss(params, module):
            out = module.apply({"params": params,
                                "batch_stats": vs["batch_stats"]},
                               inp, train=False)
            return jnp.sum(out ** 2)

        ga = jax.grad(lambda p: loss(p, g0))(vs["params"])
        gb = jax.grad(lambda p: loss(p, g1))(vs["params"])
        for a, c in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-3, atol=1e-3)


@pytest.mark.slow
class TestDStemGradSplit:
    """stem_grad_split: channel-block-decomposed 7x7 stem conv is
    bit-comparable in outputs and gradients to the fused stem."""

    def test_outputs_and_grads_match(self, rngs):
        norm = NormConfig(kind="batch")
        d0 = Discriminator(ndf=16, n_blocks=1, norm=norm, use_dropout=False,
                           dtype=jnp.float32)
        d1 = Discriminator(ndf=16, n_blocks=1, norm=norm, use_dropout=False,
                           dtype=jnp.float32, stem_grad_split=3)
        x = jnp.asarray(np.random.RandomState(0)
                        .normal(size=(2, 64, 64, 24)), jnp.float32)
        vs = d0.init(rngs, x, train=False)
        assert (jax.tree_util.tree_structure(d1.init(rngs, x, train=False))
                == jax.tree_util.tree_structure(vs))
        y0 = d0.apply(vs, x, train=False)
        y1 = d1.apply(vs, x, train=False)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-4, atol=1e-4)

        def loss(module, img):
            xin = jnp.concatenate([img, x[..., 3:]], -1)
            return jnp.sum(module.apply(vs, xin, train=False) ** 2)

        ga = jax.grad(lambda im: loss(d0, im))(x[..., :3])
        gb = jax.grad(lambda im: loss(d1, im))(x[..., :3])
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-3, atol=1e-3)


class TestUpConvShuffleVariants:
    """OpImpl.upconv_shuffle: the d2s and single-2x2-conv ('conv4')
    interleave formulations equal the stack interleave exactly."""

    def test_variants_match_stack(self):
        from mmhand_tpu.models.layers import OpImpl, UpConv
        x = jnp.asarray(np.random.RandomState(0)
                        .normal(size=(2, 8, 8, 6)), jnp.float32)
        m = UpConv(5, use_bias=True, dtype=jnp.float32,
                   impl=OpImpl(upconv_shuffle="stack"))
        vs = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(vs, x)
        assert y0.shape == (2, 16, 16, 5)
        for impl in ("d2s", "conv4"):
            mi = UpConv(5, use_bias=True, dtype=jnp.float32,
                        impl=OpImpl(upconv_shuffle=impl))
            np.testing.assert_allclose(
                np.asarray(mi.apply(vs, x)), np.asarray(y0),
                rtol=1e-5, atol=1e-5, err_msg=impl)

    def test_variant_gradients_match(self):
        from mmhand_tpu.models.layers import OpImpl, UpConv
        x = jnp.asarray(np.random.RandomState(1)
                        .normal(size=(1, 6, 6, 4)), jnp.float32)
        m = UpConv(3, dtype=jnp.float32,
                   impl=OpImpl(upconv_shuffle="stack"))
        vs = m.init(jax.random.PRNGKey(0), x)

        def loss(params, module):
            return jnp.sum(module.apply({"params": params}, x) ** 2)

        g0 = jax.grad(lambda p: loss(p, m))(vs["params"])
        for impl in ("d2s", "conv4"):
            mi = UpConv(3, dtype=jnp.float32,
                        impl=OpImpl(upconv_shuffle=impl))
            gi = jax.grad(lambda p: loss(p, mi))(vs["params"])
            for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(gi)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                           rtol=1e-4, atol=1e-4,
                                           err_msg=impl)


class TestFusedStemBN:
    """Generator(stem_fused=2): one fused BN stat reduction for the three
    stems — same outputs, gradients, and running-stat updates as unfused."""

    def _g(self, stem_fused=0):
        return Generator(ngf=16, n_blocks=1, n_downsampling=2,
                         norm=NormConfig(kind="batch"), use_dropout=False,
                         dtype=jnp.float32, stem_fused=stem_fused)

    def test_train_apply_matches_unfused(self, rngs):
        g0, g2 = self._g(0), self._g(2)
        inp = tuple(
            jnp.asarray(np.random.RandomState(i).normal(size=(2, 64, 64, c)),
                        jnp.float32) for i, c in enumerate((3, 42, 6)))
        vs = g0.init(rngs, inp, train=False)

        def run(module):
            y, upd = module.apply(vs, inp, train=True,
                                  mutable=["batch_stats"],
                                  rngs={"dropout": rngs["dropout"]})
            return y, upd["batch_stats"]

        y0, bs0 = run(g0)
        vs2 = g2.init(rngs, inp, train=False)
        assert (jax.tree_util.tree_structure(vs2)
                == jax.tree_util.tree_structure(vs))
        y2, bs2 = run(g2)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y2),
                                   rtol=1e-4, atol=1e-4)
        assert (jax.tree_util.tree_structure(bs0)
                == jax.tree_util.tree_structure(bs2))
        for a, c in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-5)

    def test_eval_and_grads_match(self, rngs):
        g0, g2 = self._g(0), self._g(2)
        inp = tuple(
            jnp.asarray(np.random.RandomState(i).normal(size=(1, 32, 32, c)),
                        jnp.float32) for i, c in enumerate((3, 42, 6)))
        vs = g0.init(rngs, inp, train=False)

        def loss(params, module, train):
            out = module.apply({"params": params,
                                "batch_stats": vs["batch_stats"]},
                               inp, train=train,
                               **({"mutable": ["batch_stats"],
                                   "rngs": {"dropout": rngs["dropout"]}}
                                  if train else {}))
            out = out[0] if train else out
            return jnp.sum(out ** 2)

        # eval-mode forward parity (running-average stats path)
        np.testing.assert_allclose(
            float(loss(vs["params"], g0, False)),
            float(loss(vs["params"], g2, False)), rtol=1e-5)
        # train-mode gradient parity (grads flow through the fused stats)
        ga = jax.grad(lambda p: loss(p, g0, True))(vs["params"])
        gb = jax.grad(lambda p: loss(p, g2, True))(vs["params"])
        for a, c in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-3, atol=2e-3)


class TestOpImplConfigPlumbing:
    """ModelConfig is the single source of truth for the TPU impl knobs;
    OpImpl defaults must mirror it, MMHandSystem must thread it, and the
    MMHAND_* env overrides (profiling escape hatch) must apply at system
    build only."""

    def test_opimpl_defaults_mirror_model_config(self):
        from mmhand_tpu.config import ModelConfig
        from mmhand_tpu.models.layers import OpImpl
        m = ModelConfig()
        assert OpImpl() == OpImpl.from_model_config(m)

    def test_system_threads_config_knobs(self):
        from mmhand_tpu.config import Config, ModelConfig
        from mmhand_tpu.train.state import MMHandSystem
        cfg = Config(model=ModelConfig(
            fine_size=32, g_n_blocks=1, ngf=8, ndf=8,
            reflect_impl="border", upconv_shuffle="d2s", bn_stats="dot",
            dstem_split=False, g_stem_fused=2))
        sys_ = MMHandSystem(cfg)
        assert sys_.generator.impl.reflect == "border"
        assert sys_.generator.impl.upconv_shuffle == "d2s"
        assert sys_.generator.impl.bn_stats == "dot"
        assert sys_.generator.stem_fused == 2
        assert sys_.d_pb.impl.reflect == "border"
        assert sys_.d_pb_gsplit.stem_grad_split == 0  # dstem_split=False

    def test_env_overrides_apply_at_system_build(self, monkeypatch):
        from mmhand_tpu.config import Config
        from mmhand_tpu.train.state import MMHandSystem
        monkeypatch.setenv("MMHAND_DSTEM_SPLIT", "1")
        monkeypatch.setenv("MMHAND_G_STEM_FUSED", "1")
        monkeypatch.setenv("MMHAND_BN_STATS", "dot")
        sys_ = MMHandSystem(Config())
        assert sys_.d_pb_gsplit.stem_grad_split == 3  # output_nc
        assert sys_.generator.stem_fused == 1
        assert sys_.generator.impl.bn_stats == "dot"
        # config object itself is untouched (overrides are build-time only)
        assert Config().model.dstem_split is False  # measured default (r4 A/B)
