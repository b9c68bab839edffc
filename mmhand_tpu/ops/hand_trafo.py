"""Canonical / relative hand-pose coordinate transforms (hand3d utils).

jnp ports of the reference's TF1 transforms
(reference hand_pose_estimators/CVPR2020_hand3d/utils/canonical_trafo.py:
21-163, utils/relative_trafo.py:18-294), closing the H8 surface: the
canonical frame (root at origin, middle-finger metacarpal on the -y axis,
pinky defining the y-rotation) that hand3d's PosePrior predicts in, the
right-hand mirror, and the kinematic-chain relative parameterization
(length, angle_x, angle_y per bone) with its inverse.

Quirk preserved deliberately: the reference's hand-rolled `atan2` adds
1e-8 to x before dividing (its TF1 had no native atan2) — kept so values
match the original network's training-time targets bit-for-bit in the
x ~ -1e-8 corner cases.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.141592653589793

# kinematic chain: parent of each keypoint (-1 = root-anchored), evaluated
# in root->leaf order (reference relative_trafo.py:146-182)
KINEMATIC_PARENT = {0: -1,
                    4: -1, 3: 4, 2: 3, 1: 2,
                    8: -1, 7: 8, 6: 7, 5: 6,
                    12: -1, 11: 12, 10: 11, 9: 10,
                    16: -1, 15: 16, 14: 15, 13: 14,
                    20: -1, 19: 20, 18: 19, 17: 18}
KINEMATIC_ORDER = [0, 4, 3, 2, 1, 8, 7, 6, 5, 12, 11, 10, 9,
                   16, 15, 14, 13, 20, 19, 18, 17]


def atan2_ref(y, x):
    """The reference's atan2 built from atan (canonical_trafo.py:21-38),
    including the +1e-8 denominator quirk."""
    tan = jnp.arctan(y / (x + 1e-8))
    tan = tan + jnp.where(x + 1e-8 < 0.0, PI, 0.0)
    tan = tan + jnp.where(tan < 0.0, 2 * PI, 0.0)
    return tan + jnp.where(tan > PI, -2 * PI, 0.0)


def _rot_x(angle):
    """(B,) -> (B, 3, 3) (reference canonical_trafo.py:65-72)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return jnp.stack([o, z, z, z, c, s, z, -s, c], -1).reshape(
        *angle.shape, 3, 3)


def _rot_y(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return jnp.stack([c, z, -s, z, o, z, s, z, c], -1).reshape(
        *angle.shape, 3, 3)


def _rot_z(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return jnp.stack([c, s, z, -s, c, z, z, z, o], -1).reshape(
        *angle.shape, 3, 3)


def canonical_trafo(coords_xyz):
    """(B, 21, 3) -> (canonical coords, total rotation (B, 3, 3))
    (reference canonical_trafo.py:96-138): root keypoint 0 to the origin,
    keypoint 12 onto the -y axis (via the +pi x-rotation), keypoint 20
    fixing the rotation about y."""
    coords_xyz = jnp.reshape(coords_xyz, (-1, 21, 3))
    ROOT, ALIGN, ROT = 0, 12, 20

    coords_t = coords_xyz - coords_xyz[:, ROOT:ROOT + 1, :]

    p = coords_t[:, ALIGN, :]
    alpha = atan2_ref(p[:, 0], p[:, 1])
    rot = _rot_z(alpha)
    coords_r1 = coords_t @ rot
    total = rot

    p = coords_r1[:, ALIGN, :]
    beta = -atan2_ref(p[:, 2], p[:, 1])
    rot = _rot_x(beta + PI)
    coords_r2 = coords_r1 @ rot
    total = total @ rot

    p = coords_r2[:, ROT, :]
    gamma = atan2_ref(p[:, 2], p[:, 0])
    rot = _rot_y(gamma)
    return coords_r2 @ rot, total @ rot


def flip_right_hand(coords_xyz_canonical, cond_right):
    """Mirror z when cond_right (reference canonical_trafo.py:141-163);
    accepts (N, 3) or (B, N, 3)."""
    coords = jnp.asarray(coords_xyz_canonical)
    expanded = coords.ndim == 2
    if expanded:
        coords = coords[None]
        cond_right = jnp.asarray(cond_right)[None]
    mirrored = jnp.stack(
        [coords[:, :, 0], coords[:, :, 1], -coords[:, :, 2]], -1)
    out = jnp.where(jnp.reshape(cond_right, (-1, 1, 1)), mirrored, coords)
    return out[0] if expanded else out


def _hom_rot_x(angle):
    """(B,) -> (B, 4, 4) homogeneous (reference relative_trafo.py:49-57).
    NOTE sign convention differs from the canonical-trafo _rot_x."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return jnp.stack([o, z, z, z,
                      z, c, -s, z,
                      z, s, c, z,
                      z, z, z, o], -1).reshape(*angle.shape, 4, 4)


def _hom_rot_y(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    return jnp.stack([c, z, s, z,
                      z, o, z, z,
                      -s, z, c, z,
                      z, z, z, o], -1).reshape(*angle.shape, 4, 4)


def _hom_trans_z(trans):
    """Translation along z in homogeneous coords (reference :81-89)."""
    o, z = jnp.ones_like(trans), jnp.zeros_like(trans)
    return jnp.stack([o, z, z, z,
                      z, o, z, z,
                      z, z, o, trans,
                      z, z, z, o], -1).reshape(*trans.shape, 4, 4)


def _backward(delta_xyz, t):
    """Bone vector (B, 3) + current global->local trafo (B, 4, 4) ->
    (length, angle_x, angle_y, new trafo) (reference :123-147)."""
    length = jnp.sqrt(jnp.sum(delta_xyz ** 2, axis=-1))
    angle_y = atan2_ref(delta_xyz[:, 0], delta_xyz[:, 2])
    hom = jnp.concatenate(
        [delta_xyz[:, :, None], jnp.ones_like(delta_xyz[:, :1, None])], 1)
    tmp = _hom_rot_y(-angle_y) @ hom
    angle_x = atan2_ref(-tmp[:, 1, 0], tmp[:, 2, 0])
    t_this = _hom_trans_z(-length) @ (_hom_rot_x(-angle_x)
                                      @ _hom_rot_y(-angle_y))
    return length, angle_x, angle_y, t_this @ t


def _forward(length, angle_x, angle_y, t):
    """(length, angles) -> global endpoint + new trafo (reference
    :107-120)."""
    t_this = _hom_trans_z(-length) @ (_hom_rot_x(-angle_x)
                                      @ _hom_rot_y(-angle_y))
    t = t_this @ t
    x0 = jnp.zeros((*length.shape, 4, 1)).at[..., 3, 0].set(1.0)
    x = jnp.linalg.inv(t) @ x0
    return x[..., :3, 0], t


def bone_rel_trafo(coords_xyz):
    """(B, 21, 3) xyz -> (B, 21, 3) [length, angle_x, angle_y] per bone
    along the kinematic chain (reference relative_trafo.py:184-241)."""
    coords_xyz = jnp.reshape(coords_xyz, (-1, 21, 3))
    b = coords_xyz.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    trafos = {}
    rel = [None] * 21
    for bone_id in KINEMATIC_ORDER:
        parent = KINEMATIC_PARENT[bone_id]
        if parent == -1:
            delta = coords_xyz[:, bone_id, :]
            t = eye
        else:
            t = trafos[parent]
            hom = jnp.concatenate(
                [coords_xyz[:, :, :, None],
                 jnp.ones((b, 21, 1, 1))], 2)
            x_p = t @ hom[:, parent]
            x_c = t @ hom[:, bone_id]
            delta = (x_c - x_p)[:, :3, 0]
        length, ax, ay, t_new = _backward(delta, t)
        rel[bone_id] = jnp.stack([length, ax, ay], 1)
        trafos[bone_id] = t_new
    return jnp.stack(rel, 1)


def bone_rel_trafo_inv(coords_rel):
    """Inverse: (B, 21, 3) [length, angle_x, angle_y] -> xyz
    (reference relative_trafo.py:244-294)."""
    coords_rel = jnp.asarray(coords_rel)
    if coords_rel.ndim == 2:
        coords_rel = coords_rel[None]
    b = coords_rel.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    trafos = {}
    xyz = [None] * 21
    for bone_id in KINEMATIC_ORDER:
        parent = KINEMATIC_PARENT[bone_id]
        t = eye if parent == -1 else trafos[parent]
        x, t_new = _forward(coords_rel[:, bone_id, 0],
                            coords_rel[:, bone_id, 1],
                            coords_rel[:, bone_id, 2], t)
        xyz[bone_id] = x
        trafos[bone_id] = t_new
    return jnp.stack(xyz, 1)
