"""Eval-harness tests: EvalUtil golden values, IS/FID math, CPM shapes,
Inception-v3 shapes, Evaluator end-to-end on random nets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmhand_tpu.eval import (
    EvalUtil,
    Evaluator,
    HPEJudge,
    fid_from_features,
    inception_score_from_logits,
)
from mmhand_tpu.models.cpm import (
    Hpm2d,
    Hpm3d,
    upsample_bilinear_align_corners,
)


class TestEvalUtil:
    def test_epe_and_pck_golden(self):
        """Golden: one keypoint at distance 3, one at 4 (3-4-5 style)."""
        ev = EvalUtil(2)
        gt = np.array([[0.0, 0.0], [10.0, 10.0]])
        pred = np.array([[3.0, 0.0], [10.0, 14.0]])
        ev.feed(gt, np.ones(2), pred)
        epe_mean, epe_median, auc, curve, thr = ev.get_measures(0, 30, 20)
        assert epe_mean == pytest.approx(3.5)
        assert epe_median == pytest.approx(3.5)
        # pck at threshold >= 4 is 1 for both
        assert curve[-1] == pytest.approx(1.0)

    def test_visibility_mask(self):
        ev = EvalUtil(2)
        ev.feed(np.zeros((2, 2)), np.array([1, 0]), np.ones((2, 2)) * 5)
        assert len(ev.data[0]) == 1 and len(ev.data[1]) == 0

    def test_perfect_predictions_auc_one(self):
        ev = EvalUtil(3)
        for _ in range(4):
            gt = np.random.RandomState(0).uniform(size=(3, 2))
            ev.feed(gt, np.ones(3), gt)
        _, _, auc, _, _ = ev.get_measures(0, 30, 20)
        assert auc == pytest.approx(1.0)


class TestInceptionScore:
    def test_uniform_predictions_score_one(self):
        logits = np.zeros((16, 10))  # uniform softmax everywhere
        mean, std = inception_score_from_logits(logits, splits=1)
        assert mean == pytest.approx(1.0, abs=1e-6)

    def test_confident_diverse_scores_high(self):
        # one-hot rotations: p(y|x) sharp, p(y) uniform -> IS = n_classes
        logits = np.eye(10)[np.arange(20) % 10] * 50.0
        mean, _ = inception_score_from_logits(logits, splits=1)
        assert mean == pytest.approx(10.0, rel=1e-3)


class TestFID:
    def test_identical_distributions_zero(self):
        rng = np.random.RandomState(0)
        f = rng.normal(size=(500, 16))
        assert fid_from_features(f, f) == pytest.approx(0.0, abs=1e-6)

    def test_shifted_distribution(self):
        rng = np.random.RandomState(0)
        f1 = rng.normal(size=(500, 8))
        f2 = rng.normal(size=(500, 8)) + 2.0
        fid = fid_from_features(f1, f2)
        # mean shift of 2 in 8 dims -> ||diff||^2 ~ 32 dominates
        assert 25.0 < fid < 40.0


class TestCPM:
    def test_upsample_align_corners_parity(self):
        """Golden vs torch nn.Upsample(align_corners=True)."""
        import torch
        import torch.nn.functional as F
        x = np.random.RandomState(0).normal(size=(1, 4, 4, 2)).astype(np.float32)
        ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 8))
        theirs = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2),
                               scale_factor=8, mode="bilinear",
                               align_corners=True)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_hpm2d_six_stage_output(self):
        net = Hpm2d(num_joints=21, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        v = net.init(jax.random.PRNGKey(0), x)
        outs = net.apply(v, x)
        assert len(outs) == 6
        assert all(o.shape == (1, 64, 64, 21) for o in outs)

    def test_hpm3d_z_regression(self):
        net = Hpm3d(num_joints=21, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 21))
        v = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(v, x)
        assert out.shape == (1, 21)

    def test_hpm2d_param_count_parity(self):
        """Golden from the reference torch net (Hpm2d(21, 3, False))."""
        net = Hpm2d(num_joints=21)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert n == 36_799_806

    def test_hpm3d_param_count_parity(self):
        """Golden from the reference torch net (Hpm3d(21, 21)); the depth FC
        is sized for 256px inputs (21*32*32 flatten, net_hpm3d.py:62)."""
        net = Hpm3d(num_joints=21)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 21)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert n == 52_259_816


@pytest.mark.slow
class TestEvaluatorE2E:
    @pytest.fixture(scope="class")
    def evaluator(self):
        # random-weight inception: metric machinery only
        return Evaluator(compute_fid=True)

    def test_feed_and_evaluate_contract(self, evaluator):
        rng = np.random.RandomState(0)
        for _ in range(2):
            pred = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
            gt = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
            evaluator.feed(pred, gt)
        scores = evaluator.evaluate(is_chunk=4)
        for key in ["IS_avg", "IS_std", "SSIM_avg", "SSIM_std", "fid"]:
            assert key in scores and np.isfinite(scores[key])
        assert scores["IS_avg"] >= 1.0
        evaluator.clean()
        assert evaluator._ssim == []

    def test_identical_images_fid_small_ssim_one(self, evaluator):
        evaluator.clean()
        rng = np.random.RandomState(1)
        imgs = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
        evaluator.feed(imgs, imgs)
        scores = evaluator.evaluate(is_chunk=8)
        assert scores["SSIM_avg"] == pytest.approx(1.0, abs=1e-4)
        assert scores["fid"] == pytest.approx(0.0, abs=1e-2)

    def test_ssim_quirk_reproduces_reference_range_mismatch(self):
        """--ssim_quirk: pred stays in [-1,1] while gt maps to [0,1]
        (reference baselines/quantitative_on_benchmarks/utils.py:100-111),
        so identical images do NOT score 1.0; the corrected default does."""
        from mmhand_tpu.ops.ssim import ssim as ssim_fn
        rng = np.random.RandomState(2)
        imgs = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
        quirk = Evaluator(compute_fid=False, ssim_quirk=True)
        quirk.feed(imgs, imgs)
        scores = quirk.evaluate(is_chunk=4)
        # exact quirk semantics: ssim(pred, (gt+1)/2)
        want = np.asarray(ssim_fn(jnp.asarray(imgs),
                                  (jnp.asarray(imgs) + 1) / 2,
                                  size_average=False))
        assert scores["SSIM_avg"] == pytest.approx(float(want.mean()),
                                                   abs=1e-5)
        assert scores["SSIM_avg"] < 0.99  # the mismatch is visible


class TestHPEJudge:
    def test_random_judge_pipeline(self):
        judge = HPEJudge.random_init(size=64)
        rng = np.random.RandomState(0)
        imgs = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        xyz = np.concatenate([
            rng.uniform(0, 64, (2, 21, 2)),
            rng.uniform(100, 600, (2, 21, 1))], axis=-1).astype(np.float32)
        judge.feed(imgs, xyz)
        r2d, r3d = judge.get_results(30, 20)
        assert np.isfinite(r2d[2]) and np.isfinite(r3d[2])
        assert 0.0 <= r2d[2] <= 1.0


class TestCreateInputImage:
    """Evaluator self-conditioning (VERDICT r1 item 8; reference
    utils.py:113-125 _create_input_image)."""

    def _xyz(self, b=2, size=64):
        rng = np.random.RandomState(0)
        m = 10
        uv = rng.uniform(m, size - m, (b, 21, 2)).astype(np.float32)
        z = rng.uniform(50, 200, (b, 21)).astype(np.float32)
        return np.concatenate([uv, z[..., None]], axis=-1)

    def test_shape_range_and_channels(self):
        from mmhand_tpu.eval import Evaluator
        img = Evaluator.create_input_image(self._xyz(), size=64)
        assert img.shape == (2, 64, 64, 3)
        assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-6
        assert img.max() == pytest.approx(1.0)  # minmax normalized
        np.testing.assert_array_equal(img[..., 0], img[..., 2])

    def test_single_pose_accepted(self):
        from mmhand_tpu.eval import Evaluator
        img = Evaluator.create_input_image(self._xyz(b=1)[0], size=64)
        assert img.shape == (1, 64, 64, 3)
        # bones rasterized: some non-background pixels
        assert (img[0, :, :, 0] > 0).sum() > 20


class TestWeightsProvenance:
    """scores carry a 'weights' field (VERDICT r1 item 5)."""

    def test_random_weights_flagged(self):
        import warnings as _w
        from mmhand_tpu.eval import Evaluator
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            ev = Evaluator(inception_vars=None, judge=None,
                           compute_fid=False)
            assert any("RANDOM Inception" in str(r.message) for r in rec)
        rng = np.random.RandomState(0)
        imgs = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        ev.feed(imgs, imgs)
        scores = ev.evaluate()
        assert scores["weights"] == "random:inception"


class TestFeedPhasedEquivalence:
    def test_phased_grouped_matches_streaming_feed(self):
        """feed_phased (grouped metric execution, r5) must produce the
        exact same scores as the streaming feed() over the same batches,
        including a ragged tail batch."""
        import warnings

        import jax
        import jax.numpy as jnp

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            judge_a = HPEJudge.random_init(size=32)
            ev_a = Evaluator(judge=judge_a)
            judge_b = HPEJudge.random_init(size=32)
            ev_b = Evaluator(judge=judge_b)

        rng = np.random.RandomState(0)
        sizes = [4, 4, 4, 4, 4, 2]  # 5 full batches + ragged tail
        preds, gts, xyzs = [], [], []
        for i, b in enumerate(sizes):
            preds.append(jnp.asarray(
                rng.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32)))
            gts.append(jnp.asarray(
                rng.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32)))
            xyzs.append(rng.uniform(2, 30, (b, 21, 3)).astype(np.float32))

        for p, g, x in zip(preds, gts, xyzs):
            ev_a.feed(p, g, gt_xyz=x)
        ev_b.feed_phased(preds, gts, xyzs, group=2)

        sa, sb = ev_a.evaluate(), ev_b.evaluate()
        assert set(sa) == set(sb)
        for k in sa:
            if isinstance(sa[k], str):
                assert sa[k] == sb[k]
            else:
                np.testing.assert_allclose(sa[k], sb[k], rtol=1e-5,
                                           atol=1e-6, err_msg=k)
