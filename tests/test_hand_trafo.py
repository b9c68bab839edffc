"""Canonical/relative hand transforms (H8): property + golden tests
(reference hand_pose_estimators/CVPR2020_hand3d/utils/canonical_trafo.py,
relative_trafo.py)."""

import numpy as np
import pytest

from mmhand_tpu.ops.hand_trafo import (
    atan2_ref,
    bone_rel_trafo,
    bone_rel_trafo_inv,
    canonical_trafo,
    flip_right_hand,
)


def _poses(b=4, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-0.2, 0.2, (b, 21, 3)).astype(np.float32) \
        + np.array([0.05, -0.1, 0.6], np.float32)


class TestAtan2:
    def test_matches_numpy_in_quadrants(self):
        y = np.array([1.0, 1.0, -1.0, -1.0, 0.5])
        x = np.array([1.0, -1.0, 1.0, -1.0, 2.0])
        got = np.asarray(atan2_ref(y, x))
        want = np.arctan2(y, x)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestCanonical:
    def test_frame_constraints(self):
        """Root at origin; kp12 on the -y axis; kp20 in the z=0 half-plane
        (reference canonical_trafo.py:105-138 docstring contract)."""
        normed, total = canonical_trafo(_poses())
        normed = np.asarray(normed)
        np.testing.assert_allclose(normed[:, 0], 0.0, atol=1e-5)
        np.testing.assert_allclose(normed[:, 12, 0], 0.0, atol=1e-5)
        np.testing.assert_allclose(normed[:, 12, 2], 0.0, atol=1e-5)
        assert (normed[:, 12, 1] < 0).all()  # 0/-D/0
        np.testing.assert_allclose(normed[:, 20, 2], 0.0, atol=1e-5)

    def test_total_rot_reproduces_output(self):
        coords = _poses()
        normed, total = canonical_trafo(coords)
        trans = coords - coords[:, :1]
        np.testing.assert_allclose(
            np.asarray(trans @ np.asarray(total)), np.asarray(normed),
            atol=1e-5)

    def test_rotation_is_orthonormal(self):
        _, total = canonical_trafo(_poses())
        t = np.asarray(total)
        eye = np.eye(3)[None].repeat(t.shape[0], 0)
        np.testing.assert_allclose(t @ t.transpose(0, 2, 1), eye, atol=1e-5)

    def test_invariance_to_rigid_motion(self):
        """Canonical coords are identical for a rotated+translated copy."""
        coords = _poses(b=2)
        ang = 0.7
        r = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        moved = coords @ r.T + np.array([0.3, -0.2, 0.1], np.float32)
        n1, _ = canonical_trafo(coords)
        n2, _ = canonical_trafo(moved)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-4)


class TestFlip:
    def test_flips_only_right(self):
        coords = _poses(b=2)
        out = np.asarray(flip_right_hand(coords, np.array([True, False])))
        np.testing.assert_allclose(out[0, :, 2], -coords[0, :, 2])
        np.testing.assert_allclose(out[1], coords[1])

    def test_unbatched(self):
        coords = _poses(b=1)[0]
        out = np.asarray(flip_right_hand(coords, np.array(True)))
        assert out.shape == (21, 3)
        np.testing.assert_allclose(out[:, 2], -coords[:, 2])


class TestBoneRel:
    def test_roundtrip(self):
        """bone_rel_trafo_inv o bone_rel_trafo == identity (the reference
        states they are inverses, relative_trafo.py:244-247)."""
        coords = _poses()
        rel = bone_rel_trafo(coords)
        back = np.asarray(bone_rel_trafo_inv(rel))
        np.testing.assert_allclose(back, coords, atol=1e-4)

    def test_lengths_are_bone_lengths(self):
        from mmhand_tpu.ops.hand_trafo import KINEMATIC_PARENT
        coords = _poses(b=1)
        rel = np.asarray(bone_rel_trafo(coords))[0]
        for bone_id, parent in KINEMATIC_PARENT.items():
            if parent == -1:
                want = np.linalg.norm(coords[0, bone_id])
            else:
                want = np.linalg.norm(coords[0, bone_id]
                                      - coords[0, parent])
            assert rel[bone_id, 0] == pytest.approx(want, abs=1e-4)

    def test_rotation_invariance_of_lengths_and_angles_shape(self):
        rel = np.asarray(bone_rel_trafo(_poses()))
        assert rel.shape == (4, 21, 3)
        assert (rel[..., 0] >= 0).all()  # lengths
        assert (np.abs(rel[..., 1:]) <= np.pi + 1e-6).all()  # angles
