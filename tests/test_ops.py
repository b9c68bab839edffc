"""Golden tests for the pure ops, checked against independent numpy
implementations of the reference formulas (not against reference code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmhand_tpu import ops


def ref_gaussian(height, width, x, y, sigma):
    """Reference formula: data/generic_dataset.py:238-242 + clips :214-215."""
    gy, gx = np.mgrid[0:height, 0:width]
    d2 = (gx - x) ** 2 + (gy - y) ** 2
    m = np.exp(-d2 / 2.0 / sigma / sigma)
    m[m > 1] = 1
    m[m < 0.0099] = 0
    return m.astype(np.float32)


class TestHeatmap:
    def test_single_matches_reference_formula(self):
        got = np.asarray(ops.gaussian_heatmap(100.3, 57.9, 64, 64, 6.0))
        want = ref_gaussian(64, 64, 100.3, 57.9, 6.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_peak_location_and_value(self):
        m = np.asarray(ops.gaussian_heatmap(40.0, 25.0, 64, 64, 6.0))
        assert m[25, 40] == pytest.approx(1.0)
        iy, ix = np.unravel_index(m.argmax(), m.shape)
        assert (iy, ix) == (25, 40)

    def test_sparsity_clip(self):
        m = np.asarray(ops.gaussian_heatmap(32.0, 32.0, 64, 64, 6.0))
        nonzero = m[m > 0]
        assert nonzero.min() >= 0.0099

    def test_batched_shape_and_match(self):
        rng = np.random.RandomState(0)
        uv = rng.uniform(5, 59, size=(2, 21, 2)).astype(np.float32)
        hm = np.asarray(ops.gaussian_heatmaps(uv, 64, 64, 6.0))
        assert hm.shape == (2, 64, 64, 21)
        for b in range(2):
            for k in range(0, 21, 7):
                want = ref_gaussian(64, 64, uv[b, k, 0], uv[b, k, 1], 6.0)
                np.testing.assert_allclose(hm[b, :, :, k], want, atol=1e-5)

    def test_pallas_matches_jnp(self):
        rng = np.random.RandomState(1)
        uv = rng.uniform(5, 250, size=(2, 21, 2)).astype(np.float32)
        a = np.asarray(ops.gaussian_heatmaps(uv, 256, 256, 6.0))
        b = np.asarray(ops.gaussian_heatmaps_pallas(uv, 256, 256, 6.0))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestDepth:
    def test_gan_decode(self):
        # rgb pixel (R=34, G=2, B=0) -> 256*2 + 34 = 546; /700
        rgb = np.zeros((4, 4, 3), np.uint8)
        rgb[..., 0] = 34
        rgb[..., 1] = 2
        got = np.asarray(ops.decode_depth_gan(rgb))
        np.testing.assert_allclose(got, np.full((4, 4), 546.0 / 700.0))

    def test_rhd_raw_decode(self):
        rgb = np.zeros((2, 2, 3), np.uint8)
        rgb[..., 0] = 10   # R (top bits)
        rgb[..., 1] = 200  # G (bottom bits)
        got = np.asarray(ops.decode_depth_rhd_raw(rgb))
        np.testing.assert_allclose(
            got, np.full((2, 2), (256.0 * 10 + 200) / (2 ** 16 - 1)),
            rtol=1e-6)

    def test_depth_planes_range_and_shape(self):
        d = np.linspace(0, 1, 16).reshape(4, 4)
        planes = np.asarray(ops.depth_to_rgb_planes(d))
        assert planes.shape == (4, 4, 3)
        np.testing.assert_allclose(planes[..., 0], (d - 0.5) / 0.5, atol=1e-6)
        np.testing.assert_allclose(planes[..., 0], planes[..., 2])

    def test_keypoint_z(self):
        np.testing.assert_allclose(
            np.asarray(ops.keypoint_z_gan(np.array([700.0]))), [255.0])


class TestImage:
    def test_normalize_roundtrip(self):
        img = np.arange(0, 256, 8, np.uint8).reshape(4, 8, 1)
        norm = np.asarray(ops.normalize_image(img))
        assert norm.min() >= -1.0 and norm.max() <= 1.0
        back = np.asarray(ops.denormalize_image(norm))
        np.testing.assert_allclose(back[..., 0], img[..., 0], atol=1)

    def test_bbox_margin_and_clip(self):
        uv = np.array([[50.7, 60.2], [100.1, 90.9]])
        xmin, xmax, ymin, ymax = ops.bbox_from_uv(uv, (320, 320))
        assert (xmin, xmax, ymin, ymax) == (30, 120, 40, 110)
        # clipping at frame edges
        uv2 = np.array([[5.0, 5.0], [318.0, 318.0]])
        xmin, xmax, ymin, ymax = ops.bbox_from_uv(uv2, (320, 320))
        assert (xmin, ymin) == (0, 0)
        assert (xmax, ymax) == (320, 320)

    def test_intrinsics_rescale(self):
        k = np.array([[614.878, 0, 313.219], [0, 615.479, 231.288], [0, 0, 1.0]])
        k2 = ops.rescale_intrinsics(k, 10, 20, 137, 147, 256)
        # project a point both ways: through K then crop+scale == through K'
        xyz = np.array([0.1, -0.05, 0.6])
        uvw = k @ xyz
        uv = uvw[:2] / uvw[2]
        uv_crop = (uv - [10, 20]) / (137 - 10 + 1.0, 147 - 20 + 1.0) * 256
        uvw2 = k2 @ xyz
        uv2 = uvw2[:2] / uvw2[2]
        np.testing.assert_allclose(uv2, uv_crop, rtol=1e-6)

    def test_flip_uv(self):
        uv = np.array([[10.0, 40.0], [246.0, 3.0]])
        flipped = np.asarray(ops.flip_uv_x(uv, 256))
        np.testing.assert_allclose(flipped[:, 0], [246.0, 10.0])
        np.testing.assert_allclose(flipped[:, 1], uv[:, 1])


class TestJointsmap:
    def _pose(self):
        rng = np.random.RandomState(3)
        uv = rng.uniform(40, 216, size=(21, 2)).astype(np.float32)
        depth = rng.uniform(0.3, 0.9, size=(21,)).astype(np.float32)
        return uv, depth

    def test_colors_and_background(self):
        uv, depth = self._pose()
        jm = np.asarray(ops.generate_jointsmap(uv, depth, 256, 256))
        assert jm.shape == (256, 256)
        vals = set(np.unique(jm).tolist())
        assert 0.0 in vals
        assert vals - {0.0} <= set(float(c) for c in ops.BONE_COLORS)

    def test_occlusion_near_bone_wins(self):
        # two crossing bones with distinct depths: nearer bone colors overlap
        uv = np.zeros((21, 2), np.float32)
        # parked joints get huge depth so bones touching them lose occlusion
        depth = np.full((21,), 1.0e6, np.float32)
        # bone (1,2) horizontal through center, shallow (near)
        uv[1] = [20, 128]
        uv[2] = [236, 128]
        depth[1] = depth[2] = 0.2
        # bone (5,6) vertical through center, deep (far)
        uv[5] = [128, 20]
        uv[6] = [128, 236]
        depth[5] = depth[6] = 0.8
        # park all other joints far outside the frame
        uv[0] = uv[3:5] = uv[7:] = [-500, -500]
        jm = np.asarray(ops.generate_jointsmap(uv, depth, 256, 256))
        # center pixel covered by both -> near bone (1,2) color 10
        assert jm[128, 128] == 10.0
        # off-crossing vertical pixel -> bone (5,6) color 40
        assert jm[40, 128] == 40.0

    def test_batched(self):
        uv, depth = self._pose()
        jm = np.asarray(ops.generate_jointsmap(
            np.stack([uv, uv]), np.stack([depth, depth]), 128, 128))
        assert jm.shape == (2, 128, 128)
        np.testing.assert_allclose(jm[0], jm[1])


class TestSSIM:
    def test_identical_images(self):
        rng = np.random.RandomState(0)
        img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        assert float(ops.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_noise_lowers_ssim(self):
        rng = np.random.RandomState(0)
        img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
        val = float(ops.ssim(img, noisy))
        assert 0.0 < val < 0.9


class TestReflectConv:
    def test_exact_vs_padded_conv_k3_k7(self):
        import jax
        import jax.numpy as jnp
        from mmhand_tpu.ops.reflect_conv import conv_reflect
        rng = np.random.RandomState(0)
        for k, shape in [(3, (2, 8, 8, 4, 5)),   # square -> batched fast path
                         (3, (1, 6, 9, 3, 4)),   # non-square -> generic path
                         (7, (2, 12, 12, 4, 5)),
                         (5, (1, 10, 11, 3, 4))]:
            p = k // 2
            b, h, w, cin, cout = shape
            x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
            kern = jnp.asarray(rng.normal(size=(k, k, cin, cout))
                               .astype(np.float32))
            bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
            ref = jax.lax.conv_general_dilated(
                jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect"),
                kern, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            got = conv_reflect(x, kern, bias)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4)

    def test_gradients_match_padded_conv(self):
        import jax
        import jax.numpy as jnp
        from mmhand_tpu.ops.reflect_conv import conv_reflect
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))

        def loss_fast(x, k):
            return jnp.sum(conv_reflect(x, k) ** 2)

        def loss_ref(x, k):
            y = jax.lax.conv_general_dilated(
                jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect"),
                k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y ** 2)

        gx1, gk1 = jax.grad(loss_fast, argnums=(0, 1))(x, kern)
        gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=1e-4)


class TestS2dConv:
    """ops/s2d_conv.py: exact space-to-depth conv reformulations (r3)."""

    def test_conv_s2d_exact(self):
        import jax.numpy as jnp
        from mmhand_tpu.ops import s2d_conv
        rng = np.random.RandomState(0)
        for k, hp, cin, cout in [(7, 22, 5, 9), (3, 12, 4, 6), (7, 30, 3, 8)]:
            x = jnp.asarray(rng.normal(size=(2, hp, hp, cin))
                            .astype(np.float32))
            kern = jnp.asarray(rng.normal(size=(k, k, cin, cout))
                               .astype(np.float32))
            bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
            ref = s2d_conv._np_ref(x, kern) + np.asarray(bias)
            got = np.asarray(s2d_conv.conv_s2d(x, kern, bias, f=2))
            np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_conv_d2s_out_exact(self):
        import jax.numpy as jnp
        from mmhand_tpu.ops import s2d_conv
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.normal(size=(2, 22, 22, 8)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(7, 7, 8, 3)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
        ref = s2d_conv._np_ref(x, kern) + np.asarray(bias)
        for f in (2, 4):
            got = np.asarray(s2d_conv.conv_d2s_out(x, kern, bias, f=f))
            np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_conv_stride_s2d_exact(self):
        import jax.numpy as jnp
        from mmhand_tpu.ops import s2d_conv
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.normal(size=(2, 18, 18, 4)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        ref = s2d_conv._np_ref(x, kern, stride=2) + np.asarray(bias)
        got = np.asarray(s2d_conv.conv_stride_s2d(x, kern, 2, bias))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_gradients_match_direct(self):
        import jax
        import jax.numpy as jnp
        from mmhand_tpu.ops import s2d_conv
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.normal(size=(1, 10, 10, 4)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(7, 7, 4, 8)).astype(np.float32))

        def loss_s2d(x, k):
            return jnp.sum(s2d_conv.conv_s2d(x, k, f=2) ** 2)

        def loss_ref(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y ** 2)

        gx1, gk1 = jax.grad(loss_s2d, argnums=(0, 1))(x, kern)
        gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                                   rtol=2e-4, atol=2e-3)

    def test_padconv_stridedconv_route_parity(self):
        """PadConv 7x7 stems / StridedConv under the s2d impl knobs equal
        the direct lowering and keep an identical param tree."""
        import jax
        import jax.numpy as jnp
        from mmhand_tpu.models.layers import OpImpl, PadConv, StridedConv
        rng = np.random.RandomState(4)
        x42 = jnp.asarray(rng.normal(size=(2, 32, 32, 42)).astype(np.float32))
        x64 = jnp.asarray(rng.normal(size=(2, 32, 32, 64)).astype(np.float32))

        def run(impl):
            stem = PadConv(64, 7, pad=3, impl=impl)
            head = PadConv(3, 7, pad=3, impl=impl)
            down = StridedConv(128, impl=impl)
            vs_s = stem.init(jax.random.PRNGKey(0), x42)
            vs_h = head.init(jax.random.PRNGKey(1), x64)
            vs_d = down.init(jax.random.PRNGKey(2), x64)
            return (stem.apply(vs_s, x42), head.apply(vs_h, x64),
                    down.apply(vs_d, x64),
                    jax.tree_util.tree_structure((vs_s, vs_h, vs_d)))

        on = run(OpImpl(stem="s2d", head="d2s", down="s2d"))
        off = run(OpImpl(stem="direct", head="direct", down="direct"))
        assert on[3] == off[3]
        for a, b in zip(on[:3], off[:3]):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-2, atol=2e-2)
