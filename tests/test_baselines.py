"""Baseline generator zoo tests: shapes + reference param-count parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmhand_tpu.models.baselines import (
    PATN2Stream,
    ResnetGenerator,
    UnetGenerator,
)


def _count(v):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))


RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


class TestResnetGenerator:
    def test_shape_and_range(self):
        g = ResnetGenerator(ngf=16, n_blocks=2, dtype=jnp.float32)
        x = jnp.ones((1, 64, 64, 3))
        v = g.init(RNGS, x, train=False)
        out = g.apply(v, x, train=False)
        assert out.shape == (1, 64, 64, 3)
        assert float(jnp.abs(out).max()) <= 1.0

    def test_param_count_parity(self):
        """Golden measured from the reference torch ResnetGenerator
        (networks.py:365-426, input_nc=3, ngf=64, 9 blocks, batch norm)."""
        g = ResnetGenerator(ngf=64, n_blocks=9)
        v = g.init(RNGS, jnp.zeros((1, 32, 32, 3)), train=False)
        assert _count(v) == 11_383_427


class TestUnetGenerator:
    def test_shape_256(self):
        g = UnetGenerator(ngf=8, num_downs=8, dtype=jnp.float32)
        x = jnp.ones((1, 256, 256, 3))
        v = g.init(RNGS, x, train=False)
        out = g.apply(v, x, train=False)
        assert out.shape == (1, 256, 256, 3)

    def test_param_count_parity(self):
        """Golden from torch UnetGenerator(3, 3, 8, ngf=64, batch norm)
        (networks.py:486-515; bench_p2p uses G(3, 3, 8) = num_downs 8)."""
        g = UnetGenerator(ngf=64, num_downs=8)
        v = g.init(RNGS, jnp.zeros((1, 256, 256, 3)), train=False)
        assert _count(v) == 54_413_955


class TestPATN2Stream:
    def test_shape(self):
        g = PATN2Stream(ngf=8, n_blocks=2, dtype=jnp.float32)
        x = (jnp.ones((1, 64, 64, 3)), jnp.ones((1, 64, 64, 42)))
        v = g.init(RNGS, x, train=False)
        out = g.apply(v, x, train=False)
        assert out.shape == (1, 64, 64, 3)

    def test_param_count_parity(self):
        """Golden from torch PATNetwork([3,42], 3, 64, BN, True, 9)
        (model_variants.py:71-170)."""
        g = PATN2Stream()
        x = (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 42)))
        v = g.init(RNGS, x, train=False)
        assert _count(v) == 41_384_579
