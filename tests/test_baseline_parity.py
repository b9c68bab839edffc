"""Baseline-zoo torch forward parity (VERDICT r1 items 2/9).

Instantiates the reference's networks.py classes (ResnetGenerator,
UnetGenerator, PoseResNet — reference
baselines/quantitative_on_benchmarks/networks/networks.py:365-990) with
random weights, converts the state_dicts, and compares eval-mode forwards —
the same pattern test_torch_parity.py uses for G/D/CPM.
"""

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "tools")

import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")


def _import_reference_networks():
    """Import the reference networks.py with apex stubbed (only DDP/amp
    helpers reference it; the nn.Module classes are torch-pure)."""
    import importlib.util
    import shutil
    import tempfile

    for name in ("apex", "apex.parallel"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["apex"].amp = types.SimpleNamespace()
    sys.modules["apex.parallel"].DistributedDataParallel = object
    sys.modules["apex"].parallel = sys.modules["apex.parallel"]

    src = ("/root/reference/baselines/quantitative_on_benchmarks/networks/"
           "networks.py")
    tmp = tempfile.mkdtemp(prefix="refnets_")
    dst = shutil.copy(src, tmp)
    spec = importlib.util.spec_from_file_location("ref_networks", dst)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _nchw(x):
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def refnets():
    return _import_reference_networks()


class TestResnetGeneratorParity:
    def test_forward_matches_reference(self, refnets, tmp_path):
        from convert_baselines_torch import convert_resnet_generator
        from mmhand_tpu.models.baselines import ResnetGenerator
        from mmhand_tpu.models.layers import NormConfig

        torch.manual_seed(0)
        t = refnets.ResnetGenerator(3, 3, ngf=8, n_blocks=2,
                                    use_dropout=False).eval()
        variables = convert_resnet_generator(t.state_dict())
        net = ResnetGenerator(ngf=8, n_blocks=2, use_dropout=False,
                              norm=NormConfig("batch"), dtype=jnp.float32)
        rng = np.random.RandomState(0)
        x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(t(_nchw(x)))
        got = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestUnetGeneratorParity:
    @pytest.mark.parametrize("num_downs", [6, 7])
    def test_forward_matches_reference(self, refnets, num_downs):
        from convert_baselines_torch import convert_unet_generator
        from mmhand_tpu.models.baselines import UnetGenerator
        from mmhand_tpu.models.layers import NormConfig

        torch.manual_seed(1)
        t = refnets.UnetGenerator(3, 3, num_downs, ngf=8,
                                  use_dropout=False).eval()
        variables = convert_unet_generator(t.state_dict(), num_downs)
        net = UnetGenerator(num_downs=num_downs, ngf=8, use_dropout=False,
                            norm=NormConfig("batch"), dtype=jnp.float32)
        size = 2 ** num_downs
        rng = np.random.RandomState(1)
        x = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(t(_nchw(x)))
        got = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPoseResNetParity:
    def _torch_opt(self, input_nc=3, num_joints=21):
        extra = types.SimpleNamespace(
            DECONV_WITH_BIAS=False, NUM_DECONV_LAYERS=3,
            NUM_DECONV_FILTERS=[256, 256, 256], NUM_DECONV_KERNELS=[4, 4, 4],
            FINAL_CONV_KERNEL=1)
        return types.SimpleNamespace(POSE_RESNET=extra, input_nc=input_nc,
                                     num_joints=num_joints)

    @pytest.mark.parametrize("size", [18, 50])
    def test_forward_matches_reference(self, refnets, size):
        from mmhand_tpu.models.baselines import (
            PoseResNet,
            load_pose_resnet_state_dict,
        )

        torch.manual_seed(size)
        block, layers = refnets.resnet_spec[size]
        t = refnets.PoseResNet(block, layers, self._torch_opt()).eval()
        # randomize BN affine/running stats so conversion is exercised
        g = torch.Generator().manual_seed(7)
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                n = m.num_features
                m.weight.data = 1.0 + 0.1 * torch.randn(n, generator=g)
                m.bias.data = 0.1 * torch.randn(n, generator=g)
                m.running_mean = 0.1 * torch.randn(n, generator=g)
                m.running_var = 0.5 + torch.rand(n, generator=g)

        variables = load_pose_resnet_state_dict(t.state_dict(), size)
        net = PoseResNet(num_joints=21, resnet_size=size, dtype=jnp.float32)
        rng = np.random.RandomState(2)
        x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(t(_nchw(x)))
        got = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
        assert got.shape == want.shape  # (1, 32, 32, 21): /4 then x2^3...
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_param_count_parity(self, refnets):
        import jax
        from mmhand_tpu.models.baselines import PoseResNet

        block, layers = refnets.resnet_spec[18]
        t = refnets.PoseResNet(block, layers, self._torch_opt())
        n_torch = sum(p.numel() for p in t.parameters())
        net = PoseResNet(num_joints=21, resnet_size=18, dtype=jnp.float32)
        v = net.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 64, 64, 3)), train=False)
        n_flax = sum(np.prod(p.shape) for p in jax.tree.leaves(v["params"]))
        assert int(n_flax) == int(n_torch)


# ---------------------------------------------------------------------------
# B5 zoo tail: depth/voxel GAN baselines (VERDICT r4 missing #2)
# ---------------------------------------------------------------------------


def _import_zoo_net(name):
    """Load a reference networks/net_*.py standalone.  Those files do
    `from models.networks import *` (resolvable only in the hpm3d copy,
    whose package __init__ pulls apex); serve the torch-pure blocks.py
    namespace through a temporary stub instead, restoring sys.modules
    afterwards so the real /root/reference/models package keeps working
    for the other parity tests."""
    import importlib.util
    import shutil
    import tempfile

    def load(path, modname):
        tmp = tempfile.mkdtemp(prefix="refzoo_")
        dst = shutil.copy(path, tmp)
        spec = importlib.util.spec_from_file_location(modname, dst)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    base = "/root/reference/baselines/quantitative_on_benchmarks/networks"
    blocks = load(f"{base}/blocks.py", "ref_zoo_blocks")
    saved = {k: sys.modules.get(k) for k in ("models", "models.networks")}
    try:
        pkg = types.ModuleType("models")
        netsmod = types.ModuleType("models.networks")
        for attr in dir(blocks):
            if not attr.startswith("_"):
                setattr(netsmod, attr, getattr(blocks, attr))
        netsmod.functools = blocks.functools
        pkg.networks = netsmod
        sys.modules["models"] = pkg
        sys.modules["models.networks"] = netsmod
        return load(f"{base}/{name}.py", f"ref_zoo_{name}")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _ncdhw(x):
    return torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))


def _ndhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))


class TestDepthVoxelZooParity:
    def test_depth_generator(self):
        from mmhand_tpu.models.voxel_nets import (
            DepthGenerator, load_depth_generator_state_dict)

        torch.manual_seed(0)
        t = _import_zoo_net("net_depthgenerator").DepthGenerator().eval()
        variables = load_depth_generator_state_dict(t.state_dict())
        x = np.random.RandomState(0).uniform(
            -1, 1, (2, 42)).astype(np.float32)
        with torch.no_grad():
            want = _nhwc(t(torch.tensor(x)))
        got = np.asarray(DepthGenerator().apply(
            variables, jnp.asarray(x), train=False))
        assert got.shape == (2, 128, 128, 1)
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_depth_discriminator(self):
        from mmhand_tpu.models.voxel_nets import (
            DepthDiscriminator, load_depth_discriminator_state_dict)

        torch.manual_seed(1)
        # reference __main__ calls DepthDiscriminator(1) which TypeErrors
        # (output_nc has no default, net_depthdiscriminator.py:59-63);
        # instantiate as the ctor actually requires
        t = _import_zoo_net("net_depthdiscriminator").DepthDiscriminator(
            1, 0, ndf=8).eval()
        variables = load_depth_discriminator_state_dict(t.state_dict())
        x = np.random.RandomState(1).uniform(
            -1, 1, (1, 256, 256, 1)).astype(np.float32)
        with torch.no_grad():
            want = t(_nchw(x))
        got = DepthDiscriminator(ndf=8).apply(
            variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(
            np.asarray(got[0]), _nhwc(want[0]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got[1]), _nhwc(want[1]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got[2]), want[2].numpy(), atol=2e-4)

    def test_voxel_generator(self):
        from mmhand_tpu.models.voxel_nets import (
            VoxelGenerator, load_voxel_generator_state_dict)

        torch.manual_seed(2)
        t = _import_zoo_net("net_voxelgenerator").VoxelGenerator().eval()
        variables = load_voxel_generator_state_dict(t.state_dict())
        x = np.random.RandomState(2).uniform(
            -1, 1, (1, 16, 16, 16, 1)).astype(np.float32)
        with torch.no_grad():
            want = _ndhwc(t(_ncdhw(x)))
        got = np.asarray(VoxelGenerator().apply(
            variables, jnp.asarray(x), train=False))
        assert got.shape == (1, 16, 16, 16, 1)
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_voxel_discriminator(self):
        from mmhand_tpu.models.voxel_nets import (
            VoxelDiscriminator, load_voxel_discriminator_state_dict)

        torch.manual_seed(3)
        t = _import_zoo_net("net_voxeldiscriminator").VoxelDiscriminator(
        ).eval()
        variables = load_voxel_discriminator_state_dict(t.state_dict())
        x = np.random.RandomState(3).uniform(
            -1, 1, (2, 16, 16, 16, 2)).astype(np.float32)
        with torch.no_grad():
            want = _ndhwc(t(_ncdhw(x)))
        got = np.asarray(VoxelDiscriminator().apply(
            variables, jnp.asarray(x), train=False))
        assert got.shape == (2, 1, 1, 1, 1)
        np.testing.assert_allclose(got, want, atol=2e-5)
