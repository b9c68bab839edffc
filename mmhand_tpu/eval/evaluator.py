"""One-stop metric engine: IS + FID + SSIM + pose-consistency PCK.

Port of the reference Evaluator
(reference baselines/quantitative_on_benchmarks/utils.py:12-139) and
HPEstimator (hpe_estimator.py:97-160), TPU-first: batched device-side
scoring instead of per-sample python loops — the inception/CPM forwards run
jitted over batches of generated images.

Output contract (reference utils.py:63-75): {IS_avg, IS_std, SSIM_avg,
SSIM_std, pck2d_auc, pck3d_auc} — plus 'fid' (north-star addition).
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmhand_tpu.eval.metrics import (
    EvalUtil,
    fid_from_features,
    inception_score_from_logits,
)
from mmhand_tpu.models.cpm import Hpm2d, Hpm3d
from mmhand_tpu.models.inception import Inception3, inception_preprocess
from mmhand_tpu.ops.ssim import ssim

KP_Z_SCALE = 256.0 / 700.0  # gt z to pixel units (reference hpe_estimator.py:122)


class HPEJudge:
    """Frozen CPM 2D + 3D judge feeding EvalUtil
    (reference hpe_estimator.py:97-160)."""

    def __init__(self, hpm2d_vars: Any, hpm3d_vars: Any,
                 num_joints: int = 21, dtype: Any = jnp.float32):
        # f32 compute by default: torch parity for the CPM nets is proven in
        # f32 (tests/test_converter_parity.py) and PCK argmax decodes are
        # the judged metric — keep the judged path at the proven precision
        # (VERDICT r4 weak #4).  Pass dtype=jnp.bfloat16 for throughput.
        self.hpm2d = Hpm2d(num_joints, dtype=dtype)
        self.hpm3d = Hpm3d(num_joints, dtype=dtype)
        self.v2d = hpm2d_vars
        self.v3d = hpm3d_vars
        self.eval2d = EvalUtil(num_joints)
        self.eval3d = EvalUtil(num_joints)

        @jax.jit
        def predict(v2d, v3d, images):
            heat = self.hpm2d.apply(v2d, images)[-1]       # (B, H, W, 21)
            z = self.hpm3d.apply(v3d, heat)                 # (B, 21)
            b, h, w, k = heat.shape
            flat = heat.transpose(0, 3, 1, 2).reshape(b, k, -1)
            idx = jnp.argmax(flat, axis=-1)
            # reference decodes y = idx // H, x = idx % W (hpe_estimator.py:131)
            y = (idx // h).astype(jnp.float32)
            x = (idx % w).astype(jnp.float32)
            return x, y, z * h

        self._predict = predict

    random_weights = False

    @classmethod
    def random_init(cls, rng=None, num_joints: int = 21, size: int = 256,
                    dtype: Any = jnp.float32):
        """Judge with random weights — exercises the full pipeline when no
        trained/converted CPM weights are available."""
        warnings.warn(
            "HPEJudge running with RANDOM CPM weights: pck2d_auc/pck3d_auc "
            "are structural pipeline checks, NOT comparable metrics "
            "(pass --hpm2d_npz/--hpm3d_npz converted weights for real "
            "numbers)", stacklevel=2)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        v2d = Hpm2d(num_joints).init(k1, jnp.zeros((1, size, size, 3)))
        v3d = Hpm3d(num_joints).init(
            k2, jnp.zeros((1, size, size, num_joints)))
        judge = cls(v2d, v3d, num_joints, dtype=dtype)
        judge.random_weights = True
        return judge

    def feed(self, images, gt_xyz):
        """images: (B, H, W, 3) in [-1, 1]; gt_xyz: (B, 21, 3) with real
        depth in the z column (scaled to pixels internally, reference
        hpe_estimator.py:112-137)."""
        x, y, z = jax.device_get(self._predict(self.v2d, self.v3d, images))
        gt = np.asarray(gt_xyz, np.float64).copy()
        gt[..., -1] = gt[..., -1] / 700.0 * 256.0
        for b in range(gt.shape[0]):
            p2d = np.stack([x[b], y[b]], axis=-1)
            p3d = np.concatenate([p2d, z[b][:, None]], axis=-1)
            vis = np.ones(gt.shape[1])
            self.eval2d.feed(gt[b, :, :2], vis, p2d)
            self.eval3d.feed(gt[b], vis, p3d)

    def get_results(self, pixel_offset: float = 30.0, n_steps: int = 20):
        return (self.eval2d.get_measures(0, pixel_offset, n_steps),
                self.eval3d.get_measures(0, pixel_offset, n_steps))


class Evaluator:
    """Feeds batches of (generated, ground-truth) images; produces the
    reference score dict + FID."""

    def __init__(self, inception_vars: Optional[Any] = None,
                 judge: Optional[HPEJudge] = None,
                 compute_fid: bool = True,
                 ssim_quirk: bool = False,
                 dtype: Any = jnp.float32):
        # f32 compute by default: converter parity vs torchvision is proven
        # in f32 (tests/test_converter_parity.py:94,122) and FID covariances
        # over 2048-d pool features are precision-sensitive — an
        # unquantified bf16 shift would land in the north-star FID
        # comparison (VERDICT r4 weak #4).  dtype=jnp.bfloat16 opts back
        # into throughput mode; the measured delta is in BASELINE.md.
        self.inception = Inception3(dtype=dtype)
        self.random_inception = inception_vars is None
        if inception_vars is None:
            warnings.warn(
                "Evaluator running with RANDOM Inception-v3 weights: "
                "IS/FID are structural pipeline checks, NOT comparable "
                "metrics (pass --inception_npz converted weights for real "
                "numbers)", stacklevel=2)
            inception_vars = self.inception.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
        self.inc_vars = inception_vars
        self.judge = judge
        self.compute_fid = compute_fid
        self.ssim_quirk = ssim_quirk
        self._logits_fake: list = []
        self._pool_fake: list = []
        self._pool_real: list = []
        self._ssim: list = []

        @jax.jit
        def inception_fwd(v, images_m11):
            logits, pool = self.inception.apply(
                v, inception_preprocess(images_m11))
            return logits, pool

        self._inception_fwd = inception_fwd

        quirk = self.ssim_quirk

        @jax.jit
        def ssim_fwd(pred, gt):
            # jitted: an eager ssim costs ~15 per-op dispatches per batch,
            # each a network RTT on the tunnel backend (r5: the eval loop
            # ran at ~1 img/s before this)
            if quirk:
                return ssim(pred, (gt + 1) / 2, size_average=False)
            return ssim((pred + 1) / 2, (gt + 1) / 2, size_average=False)

        self._ssim_fwd = ssim_fwd

    @staticmethod
    def create_input_image(xyz, size: int = 256) -> np.ndarray:
        """Synthesize the conditioning image from xyz alone
        (reference utils.py:113-125 _create_input_image): depth-colored
        bone jointsmap, minmax-normalized to [0, 1], replicated to 3
        channels.  Lets the evaluator (and the pix2pix/cyclegan-style
        baseline judges) score pose-only inputs with no loader-supplied
        conditioning.

        Args:
          xyz: (B, 21, 3) or (21, 3); z in the reference's pixel-ish scale
            (pass raw_z/700*255 for crop-tree data, see scripts/).
        Returns:
          (B, H, W, 3) float32 in [0, 1].
        """
        from mmhand_tpu.ops.jointsmap import generate_jointsmap

        xyz = np.asarray(xyz, np.float32)
        if xyz.ndim == 2:
            xyz = xyz[None]
        uv, z = xyz[:, :, :2], xyz[:, :, 2]
        jm = np.asarray(generate_jointsmap(uv, z, size, size))  # (B, H, W)
        lo = jm.min(axis=(1, 2), keepdims=True)
        hi = jm.max(axis=(1, 2), keepdims=True)
        jm = (jm - lo) / np.maximum(hi - lo, 1e-6)
        return np.repeat(jm[..., None], 3, axis=-1).astype(np.float32)

    def feed(self, pred_images, gt_images, gt_xyz=None):
        """pred/gt: (B, H, W, 3) in [-1, 1]; gt_xyz: optional (B, 21, 3)."""
        pred_images = jnp.asarray(pred_images, jnp.float32)
        gt_images = jnp.asarray(gt_images, jnp.float32)

        logits, pool = self._inception_fwd(self.inc_vars, pred_images)
        self._logits_fake.append(np.asarray(logits))
        self._pool_fake.append(np.asarray(pool))
        if self.compute_fid:
            _, pool_r = self._inception_fwd(self.inc_vars, gt_images)
            self._pool_real.append(np.asarray(pool_r))

        # per-sample SSIM on [0,1]-mapped images by default.  The reference
        # compares pred in [-1,1] against gt/255 in [0,1] — a range-mismatch
        # quirk (reference baselines/quantitative_on_benchmarks/
        # utils.py:100-111).  ssim_quirk=True reproduces it verbatim so
        # numbers can be A/B'd 1:1 against runs of the reference harness;
        # the corrected default maps both sides to [0,1].
        s = self._ssim_fwd(pred_images, gt_images)
        self._ssim.extend(np.asarray(s).tolist())

        if self.judge is not None and gt_xyz is not None:
            self.judge.feed(pred_images, gt_xyz)

    def feed_phased(self, preds, gts, xyzs=None, group: int = 4):
        """Feed many batches metric-by-metric instead of batch-by-batch.

        Same results as feed() over the list; different execution order:
        all inception batches, then all SSIM, then all judge, with up to
        `group` same-shaped batches concatenated per device call.  On the
        tunnel-attached backend each program invocation costs ~0.7 s of
        dispatch+sync latency regardless of batch size (measured r5:
        ~1.7 img/s interleaved / ~3.5 phased-ungrouped vs back-to-back
        component rates of 80+ img/s), so fewer+bigger invocations win;
        on real hosts bigger metric batches simply utilize the chip
        better.  `preds`/`gts`: lists of (B,H,W,3) device arrays."""

        def grouped(items):
            i = 0
            while i < len(items):
                j = i + 1
                # concat only same-batch-size neighbors (the ragged tail
                # batch stays alone: no recompile for a one-off shape)
                while (j < len(items) and j - i < group
                       and items[j].shape[0] == items[i].shape[0]):
                    j += 1
                yield jnp.concatenate(
                    [jnp.asarray(x, jnp.float32) for x in items[i:j]],
                    axis=0) if j - i > 1 else jnp.asarray(
                        items[i], jnp.float32)
                i = j

        for p, g in zip(grouped(preds), grouped(gts)):
            logits, pool = self._inception_fwd(self.inc_vars, p)
            self._logits_fake.append(np.asarray(logits))
            self._pool_fake.append(np.asarray(pool))
            if self.compute_fid:
                _, pool_r = self._inception_fwd(self.inc_vars, g)
                self._pool_real.append(np.asarray(pool_r))
        for p, g in zip(grouped(preds), grouped(gts)):
            s = self._ssim_fwd(p, g)
            self._ssim.extend(np.asarray(s).tolist())
        if self.judge is not None and xyzs is not None:
            fed_preds = [p for p, x in zip(preds, xyzs) if x is not None]
            fed_xyzs = [x for x in xyzs if x is not None]
            i = 0
            for p in grouped(fed_preds):
                n, j, acc = p.shape[0], i, []
                while n > 0:
                    acc.append(fed_xyzs[j])
                    n -= len(fed_xyzs[j])
                    j += 1
                self.judge.feed(p, np.concatenate(acc, axis=0))
                i = j

    def evaluate(self, is_chunk: int = 64) -> dict:
        """Score dict (reference utils.py:63-75 contract + 'fid').

        IS is computed in chunks of `is_chunk` images with splits=1 per
        chunk, mean/std across chunks — matching the reference's cache-64
        scheme (utils.py:81-98)."""
        logits = np.concatenate(self._logits_fake, axis=0)
        chunk_scores = []
        for i in range(0, len(logits), is_chunk):
            part = logits[i:i + is_chunk]
            if len(part):
                chunk_scores.append(inception_score_from_logits(part, 1)[0])
        scores = {
            "IS_avg": float(np.mean(chunk_scores)),
            "IS_std": float(np.std(chunk_scores)),
            "SSIM_avg": float(np.mean(self._ssim)),
            "SSIM_std": float(np.std(self._ssim)),
        }
        if self.judge is not None:
            r2d, r3d = self.judge.get_results(30, 20)
            scores["pck2d_auc"] = r2d[2]
            scores["pck3d_auc"] = r3d[2]
        if self.compute_fid and self._pool_real:
            scores["fid"] = fid_from_features(
                np.concatenate(self._pool_real, 0),
                np.concatenate(self._pool_fake, 0))
        # impossible-to-miss provenance field (VERDICT r1 item 5)
        random_bits = []
        if self.random_inception:
            random_bits.append("inception")
        if self.judge is not None and self.judge.random_weights:
            random_bits.append("cpm")
        scores["weights"] = (
            "random:" + "+".join(random_bits) if random_bits else "loaded")
        return scores

    def clean(self):
        self._logits_fake.clear()
        self._pool_fake.clear()
        self._pool_real.clear()
        self._ssim.clear()
