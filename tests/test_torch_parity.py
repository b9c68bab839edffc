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
