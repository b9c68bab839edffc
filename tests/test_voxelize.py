"""Voxelization golden tests: jnp ports vs literal numpy transcriptions of
the reference algorithms (reference baselines/quantitative_on_benchmarks/
data/msrahand_dataset.py:34-132, 318-492, 651-711)."""

import numpy as np
import pytest

from mmhand_tpu.ops.voxelize import (
    V2VVoxelization,
    extract_coord_from_output,
    generate_coord,
    generate_cubic_hand,
    generate_heatmap_gt,
    make_ellipsoid_mask,
    scattering,
    warp2continuous,
)


# ---- literal numpy transcriptions of the reference formulas (goldens) ----

def _np_generate_coord(points, refpoint, new_size, angle, trans, sizes):
    cubic_size, cropped_size, original_size = sizes
    coord = np.array(points, np.float64)
    coord = (coord - refpoint) / (cubic_size / 2)
    coord = (coord + 1) / (2 / cropped_size)
    coord += original_size / 2 - cropped_size / 2
    resize_scale = new_size / 100
    if new_size < 100:
        coord = coord * resize_scale + original_size / 2 * (1 - resize_scale)
    elif new_size > 100:
        coord = coord * resize_scale - original_size / 2 * (resize_scale - 1)
    if angle != 0:
        oc = coord.copy()
        oc[:, 0] -= original_size / 2
        oc[:, 1] -= original_size / 2
        coord[:, 0] = oc[:, 0] * np.cos(angle) - oc[:, 1] * np.sin(angle)
        coord[:, 1] = oc[:, 0] * np.sin(angle) + oc[:, 1] * np.cos(angle)
        coord[:, 0] += original_size / 2
        coord[:, 1] += original_size / 2
    coord -= trans
    return coord


def _np_scattering(coord, cropped_size):
    coord = coord.astype(np.int32)
    mask = ((coord[:, 0] >= 0) & (coord[:, 0] < cropped_size)
            & (coord[:, 1] >= 0) & (coord[:, 1] < cropped_size)
            & (coord[:, 2] >= 0) & (coord[:, 2] < cropped_size))
    coord = coord[mask, :]
    cubic = np.zeros((cropped_size,) * 3)
    cubic[coord[:, 0], coord[:, 1], coord[:, 2]] = 1
    return cubic


def _np_rotation(ax, ay, az):
    rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]])
    ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]])
    rz = np.array([[np.cos(az), -np.sin(az), 0],
                   [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    return rz @ ry @ rx


def _np_make_ellipsoid_image(shape, center, radii, angle):
    """Verbatim transcription of reference make_ellipsoid_image :71-132."""
    angle = -1 * np.asarray(angle, np.float64)
    r = _np_rotation(*angle)
    radii = np.array(radii, np.float64)
    xi = tuple(np.linspace(0, s - 1, s) - np.floor(0.5 * s) for s in shape)
    xi = np.meshgrid(*xi, indexing="ij")
    points = np.array(xi).reshape(3, -1)[::-1]
    points = np.dot(r, points).T
    grid_center = np.array(center) - 0.5 * np.array(shape[::-1])
    grid_center = np.dot(r, grid_center)
    points = points[:, ::-1]
    grid_center = grid_center[::-1]
    radii = radii[::-1]
    dR = (points - grid_center) ** 2 / radii ** 2
    nR = np.sum(dR, axis=1).reshape(shape)
    return (nR <= 1).astype(np.uint8).T


SIZES = (200.0, 16, 24)  # cubic mm, cropped, original (small for tests)


class TestGenerateCoord:
    @pytest.mark.parametrize("new_size,angle", [
        (100.0, 0.0), (85.0, 0.3), (120.0, -0.4), (100.0, 0.7)])
    def test_matches_reference(self, new_size, angle):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-80, 80, (50, 3)) + 100.0
        ref = np.array([100.0, 100.0, 100.0])
        trans = rng.uniform(0, 8, 3)
        want = _np_generate_coord(pts, ref, new_size, angle, trans, SIZES)
        got = np.asarray(generate_coord(pts, ref, new_size, angle, trans,
                                        SIZES))
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestScattering:
    def test_matches_reference_with_out_of_range(self):
        rng = np.random.RandomState(1)
        coord = rng.uniform(-4, 20, (100, 3))  # includes out-of-range
        want = _np_scattering(coord.copy(), 16)
        got = np.asarray(scattering(coord, 16))
        np.testing.assert_array_equal(got, want)


class TestEllipsoid:
    @pytest.mark.parametrize("radii,angle", [
        ([3.0, 3.0, 3.0], [80.0, 30.0, 20.0]),   # spherical (hand bones)
        ([5.0, 2.0, 3.0], [0.0, 0.0, 0.0]),      # axis-aligned ellipsoid
        ([5.0, 2.0, 3.0], [25.0, -10.0, 40.0]),  # rotated ellipsoid
    ])
    def test_matches_reference(self, radii, angle):
        size = 16
        center = [7.2, 5.5, 9.1]
        want = _np_make_ellipsoid_image(
            (size,) * 3, center, radii, np.deg2rad(angle))
        got = np.asarray(make_ellipsoid_mask(
            size, center, radii, np.deg2rad(angle)))
        np.testing.assert_array_equal(got, want)


class TestWarpAndExtract:
    def test_warp_roundtrip(self):
        """scatter voxel center -> warp2continuous recovers world coords
        within half a voxel (reference evaluate :704-711)."""
        rng = np.random.RandomState(2)
        ref = np.array([30.0, -20.0, 400.0])
        world = rng.uniform(-90, 90, (21, 3)) + ref
        coord = np.asarray(generate_coord(
            world, ref, 100.0, 0.0, np.zeros(3),
            (200.0, 64, 64)))
        back = np.asarray(warp2continuous(
            np.floor(coord) + 0.5, ref, 200.0, 64))
        assert np.abs(back - world).max() <= 200.0 / 64  # one voxel in mm

    def test_extract_coord_matches_unravel(self):
        rng = np.random.RandomState(3)
        hm = rng.uniform(0, 1, (2, 5, 8, 8, 8))
        got = np.asarray(extract_coord_from_output(hm))
        flat = hm.reshape(-1, 512)
        want = np.array(np.unravel_index(
            np.argmax(flat, axis=1), (8, 8, 8))).T.reshape(2, 5, 3) + 0.5
        np.testing.assert_allclose(got, want)


class TestCubicHandAndHeatmap:
    def test_hand_cube_binary_and_contains_keypoints(self):
        rng = np.random.RandomState(4)
        ref = np.zeros(3)
        kp = rng.uniform(-60, 60, (21, 3))
        sizes = (200.0, 32, 48)
        t = np.full(3, (48 - 32) / 2)
        cube = np.asarray(generate_cubic_hand(kp, ref, 100.0, 0.0, t, sizes))
        assert set(np.unique(cube)).issubset({0.0, 1.0})
        # every in-range keypoint voxel is occupied
        coord = np.asarray(generate_coord(kp, ref, 100.0, 0.0, t, sizes))
        ivox = coord.astype(np.int32)
        for v in ivox:
            if (v >= 0).all() and (v < 32).all():
                assert cube[v[0], v[1], v[2]] == 1.0
        # bones add volume beyond the 21 single voxels
        assert cube.sum() > 21

    def test_heatmap_peaks_at_keypoints(self):
        ref = np.zeros(3)
        kp = np.array([[10.0, -20.0, 40.0]])
        sizes = (200.0, 32, 48)
        t = np.full(3, (48 - 32) / 2)
        hm = np.asarray(generate_heatmap_gt(kp, ref, 100.0, 0.0, t, sizes,
                                            pool_factor=2, std=1.7))
        assert hm.shape == (1, 16, 16, 16)
        peak = np.unravel_index(np.argmax(hm[0]), hm[0].shape)
        coord = np.asarray(generate_coord(kp, ref, 100.0, 0.0, t, sizes))[0]
        np.testing.assert_allclose(np.array(peak) + 0.5, coord / 2.0,
                                   atol=0.51)


class TestV2VTransform:
    def test_deterministic_mode_and_evaluate(self):
        rng = np.random.RandomState(5)
        ref = np.array([0.0, 0.0, 350.0])
        pts = rng.uniform(-90, 90, (200, 3)) + ref
        kp = rng.uniform(-80, 80, (21, 3)) + ref
        v2v = V2VVoxelization(200.0, augmentation=False)
        inp, coords, hand = v2v({"points": pts, "keypoints": kp,
                                 "refpoint": ref})
        assert inp.shape == (1, 64, 64, 64)
        assert hand.shape == (1, 64, 64, 64)
        assert coords.shape == (21, 3)
        # evaluate() inverts voxel coords to world mm
        hm = v2v.generate_heatmap(kp, ref)
        back = np.asarray(v2v.evaluate(np.asarray(hm), ref))
        assert np.abs(back - kp).max() < 2 * 200.0 / 64  # two voxels

    def test_augmentation_draw_ranges(self):
        v2v = V2VVoxelization(200.0, augmentation=True,
                              rng=np.random.RandomState(0))
        for _ in range(20):
            ns, ang, tr = v2v._draws()
            assert 80 <= ns <= 120
            assert -40 / 180 * np.pi <= ang <= 40 / 180 * np.pi
            assert ((0 <= tr) & (tr <= 32)).all()
