"""Golden tests for losses against hand-computed reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmhand_tpu.losses import L1PlusPerceptual, gan_loss


class TestGANLoss:
    def test_bce_with_logits_real(self):
        """BCEWithLogits(x, 1) = softplus(-x), mean over the feature map
        (reference network_utils.py:141-163)."""
        logits = np.array([[0.5, -1.0], [2.0, 0.0]], np.float32)
        want = np.mean(np.log1p(np.exp(-logits)))
        got = float(gan_loss(logits, True))
        assert got == pytest.approx(float(want), rel=1e-6)

    def test_bce_with_logits_fake(self):
        logits = np.array([0.5, -1.0, 2.0], np.float32)
        want = np.mean(np.log1p(np.exp(logits)))
        assert float(gan_loss(logits, False)) == pytest.approx(
            float(want), rel=1e-6)

    def test_lsgan_mode(self):
        logits = np.array([0.5, 2.0], np.float32)
        assert float(gan_loss(logits, True, "lsgan")) == pytest.approx(
            float(np.mean((logits - 1.0) ** 2)), rel=1e-6)

    def test_numerical_stability_large_logits(self):
        assert np.isfinite(float(gan_loss(jnp.array([1e4]), False)))
        assert np.isfinite(float(gan_loss(jnp.array([-1e4]), True)))


class TestL1PlusPerceptual:
    def _loss(self, lam_a=10.0, lam_b=10.0):
        loss = L1PlusPerceptual(lambda_l1=lam_a, lambda_perceptual=lam_b)
        vgg = loss.init_vgg(jax.random.PRNGKey(0), (1, 32, 32, 3))
        return L1PlusPerceptual(lambda_l1=lam_a, lambda_perceptual=lam_b,
                                vgg_variables=vgg)

    def test_zero_lambdas_short_circuit(self):
        """Both lambdas zero -> zeros (reference L1_plus_perceptualLoss.py:33-35)."""
        loss = L1PlusPerceptual(lambda_l1=0, lambda_perceptual=0)
        total, l1, percep = loss(jnp.ones((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 3)))
        assert float(total) == 0.0 and float(l1) == 0.0 and float(percep) == 0.0

    def test_l1_term_golden(self):
        loss = self._loss()
        rng = np.random.RandomState(0)
        fake = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        real = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        total, l1, percep = loss(fake, real)
        want_l1 = 10.0 * np.mean(np.abs(fake - real))
        assert float(l1) == pytest.approx(float(want_l1), rel=1e-4)
        assert float(total) == pytest.approx(float(l1) + float(percep), rel=1e-5)

    def test_identical_inputs_zero(self):
        loss = self._loss()
        img = np.random.RandomState(1).uniform(
            -1, 1, (1, 32, 32, 3)).astype(np.float32)
        total, l1, percep = loss(img, img)
        assert float(total) == pytest.approx(0.0, abs=1e-4)

    def test_perceptual_gradient_flows_only_through_fake(self):
        loss = self._loss(lam_a=0.0)
        img = jnp.ones((1, 32, 32, 3)) * 0.3
        tgt = jnp.ones((1, 32, 32, 3)) * -0.2

        g_fake = jax.grad(lambda x: loss(x, tgt)[0])(img)
        g_real = jax.grad(lambda y: loss(img, y)[0])(tgt)
        assert float(jnp.abs(g_fake).max()) > 0
        # real path is stop_gradient'd (reference :62 .detach())... but the
        # L1 on raw real would flow; with lam_a=0 only perceptual remains.
        assert float(jnp.abs(g_real).max()) == 0.0
