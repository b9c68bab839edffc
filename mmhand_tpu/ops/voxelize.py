"""V2V-style voxelization + 3-D augmentation for the MSRA depth pipeline.

TPU-first port of the reference's MSRA machinery
(reference baselines/quantitative_on_benchmarks/data/msrahand_dataset.py:
34-132 ellipsoid/rotation, 318-492 coordinate warps / scattering / heatmap,
651-711 V2VVoxelization): point clouds are normalized around a reference
point, augmented (resize/rotate-z/translate), scattered into a cropped_size^3
occupancy grid, and keypoints become voxel coordinates / Gaussian heatmaps.

Design notes:
* every transform is vectorized jnp (static shapes); scattering uses
  `.at[].set(mode="drop")` instead of boolean indexing (dynamic shapes are
  not XLA-compatible);
* the reference draws bone capsules with pyellipsoid; radii are spherical
  (`[d/2.5]*3`, :800) so the rotated quadric reduces to a sphere — the
  general rotated-ellipsoid form is kept for parity and tested against a
  literal numpy transcription of the reference algorithm;
* augmentation randomness is drawn host-side (numpy RandomState) exactly
  like the reference; the heavy rasterization runs jitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# bone connections (reference msrahand_dataset.py:12-32; wrist spokes
# commented out upstream — preserved)
CONNECTIONS = np.array([
    [1, 2], [2, 3], [3, 4],
    [5, 6], [6, 7], [7, 8],
    [9, 10], [10, 11], [11, 12],
    [13, 14], [14, 15], [15, 16],
    [17, 18], [18, 19], [19, 20],
], np.int32)


def build_rotation_matrix(ax, ay, az, inverse=False):
    """Euler X->Y->Z rotation (reference :34-68)."""
    if inverse:
        ax, ay, az = -ax, -ay, -az
    rx = jnp.array([[1, 0, 0],
                    [0, jnp.cos(ax), -jnp.sin(ax)],
                    [0, jnp.sin(ax), jnp.cos(ax)]])
    ry = jnp.array([[jnp.cos(ay), 0, jnp.sin(ay)],
                    [0, 1, 0],
                    [-jnp.sin(ay), 0, jnp.cos(ay)]])
    rz = jnp.array([[jnp.cos(az), -jnp.sin(az), 0],
                    [jnp.sin(az), jnp.cos(az), 0],
                    [0, 0, 1]])
    return rz @ ry @ rx


def make_ellipsoid_mask(size: int, center, radii, angle):
    """Binary (size, size, size) ellipsoid, indexed [x, y, z] like the
    occupancy cube (reference make_ellipsoid_image :71-132 followed by the
    caller's indexing convention — the reference's axis reversals and final
    transpose algebraically reduce to: rotate the (voxel - center) offset
    and test the quadric with reversed radii)."""
    center = jnp.asarray(center, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    angle = -jnp.asarray(angle, jnp.float32)
    r = build_rotation_matrix(angle[0], angle[1], angle[2])
    frac = 0.5 * size - np.floor(0.5 * size)  # 0 for even sizes

    g = jnp.arange(size, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(g, g, g, indexing="ij")
    off = jnp.stack([gx, gy, gz], axis=-1) - center + frac  # (S,S,S,3)
    # the reference's axis reversals cancel pairwise (points and radii are
    # both reversed before the quadric): net form is R(offset) against the
    # ORIGINAL-order radii
    e = jnp.einsum("de,xyze->xyzd", r, off)
    n = jnp.sum((e / radii) ** 2, axis=-1)
    return (n <= 1.0).astype(jnp.float32)


def discretize(coord, cropped_size: int):
    """[-1, 1] -> [0, cropped_size] (reference :318-324)."""
    return (coord + 1.0) / (2.0 / cropped_size)


def warp2continuous(coord, refpoint, cubic_size: float, cropped_size: int):
    """Voxel indices -> world mm around refpoint (reference :327-339)."""
    coord = coord * (2.0 / cropped_size) - 1.0
    return coord * cubic_size / 2.0 + jnp.asarray(refpoint)


def generate_coord(points, refpoint, new_size, angle, trans, sizes):
    """Normalize/augment points into cropped-volume voxel coordinates
    (reference :384-428).  All of new_size/angle/trans may be traced.

    The reference's three resize branches are one formula:
    coord*s + (original/2)*(1-s)."""
    cubic_size, cropped_size, original_size = sizes
    coord = (jnp.asarray(points, jnp.float32) - jnp.asarray(refpoint)) \
        / (cubic_size / 2.0)
    coord = discretize(coord, cropped_size)
    coord = coord + (original_size / 2.0 - cropped_size / 2.0)

    s = new_size / 100.0
    coord = coord * s + original_size / 2.0 * (1.0 - s)

    # z-axis rotation around the volume center (reference :417-424);
    # angle == 0 reproduces the reference's skipped branch exactly
    cx = coord[:, 0] - original_size / 2.0
    cy = coord[:, 1] - original_size / 2.0
    rx = cx * jnp.cos(angle) - cy * jnp.sin(angle) + original_size / 2.0
    ry = cx * jnp.sin(angle) + cy * jnp.cos(angle) + original_size / 2.0
    coord = jnp.stack([rx, ry, coord[:, 2]], axis=-1)
    return coord - jnp.asarray(trans)


def scattering(coord, cropped_size: int):
    """Point coords [0, cropped_size) -> binary occupancy cube
    (reference :341-362); out-of-range points dropped."""
    idx = jnp.asarray(coord).astype(jnp.int32)
    # emulate the reference's boolean mask with scatter-drop: send
    # out-of-range points to an out-of-bounds index (mode='drop')
    in_range = jnp.all((idx >= 0) & (idx < cropped_size), axis=1)
    idx = jnp.where(in_range[:, None], idx, cropped_size)
    cubic = jnp.zeros((cropped_size,) * 3, jnp.float32)
    return cubic.at[idx[:, 0], idx[:, 1], idx[:, 2]].set(1.0, mode="drop")


def extract_coord_from_output(output, center: bool = True):
    """(..., S, S, S) heatmaps -> (..., 3) argmax voxel coords
    (reference :362-382)."""
    output = jnp.asarray(output)
    vsize = output.shape[-3:]
    flat = output.reshape(*output.shape[:-3], -1)
    max_index = jnp.argmax(flat, axis=-1)
    i0 = max_index // (vsize[1] * vsize[2])
    i1 = (max_index // vsize[2]) % vsize[1]
    i2 = max_index % vsize[2]
    xyz = jnp.stack([i0, i1, i2], axis=-1).astype(jnp.float32)
    return xyz + 0.5 if center else xyz


def generate_cubic_input(points, refpoint, new_size, angle, trans, sizes):
    """Point cloud -> occupancy cube (reference :430-437)."""
    coord = generate_coord(points, refpoint, new_size, angle, trans, sizes)
    return scattering(coord, sizes[1])


def generate_cubic_hand(keypoints, refpoint, new_size, angle, trans, sizes):
    """Keypoints -> occupancy + spherical bone capsules (reference
    :440-468: radii [d/2.5]*3, rot (80, 30, 20) deg — spherical, so the
    rotation is measure-preserving)."""
    cropped_size = sizes[1]
    coord = generate_coord(keypoints, refpoint, new_size, angle, trans,
                           sizes)
    cubic = scattering(coord, cropped_size)
    rot = jnp.deg2rad(jnp.array([80.0, 30.0, 20.0]))

    j1 = coord[CONNECTIONS[:, 0]]
    j2 = coord[CONNECTIONS[:, 1]]
    d = jnp.sqrt(jnp.sum((j1 - j2) ** 2, axis=1))
    centers = jnp.abs(j1 - j2) / 2.0 + jnp.minimum(j1, j2)

    def one(center, dist):
        return make_ellipsoid_mask(cropped_size, center,
                                   jnp.stack([dist / 2.5] * 3), rot)

    cubic = cubic + jnp.sum(jax.vmap(one)(centers, d), axis=0)
    return (cubic >= 1.0).astype(jnp.float32)


def generate_heatmap_gt(keypoints, refpoint, new_size, angle, trans, sizes,
                        pool_factor: int = 2, std: float = 1.7):
    """Keypoints -> (K, S/pf, S/pf, S/pf) Gaussian heatmaps
    (reference :471-492)."""
    cropped_size = sizes[1]
    coord = generate_coord(keypoints, refpoint, new_size, angle, trans,
                           sizes) / pool_factor
    out = cropped_size // pool_factor
    g = jnp.arange(out, dtype=jnp.float32) + 0.5  # cell centers
    gx, gy, gz = jnp.meshgrid(g, g, g, indexing="ij")
    dx = (gx[None] - coord[:, 0, None, None, None]) / std
    dy = (gy[None] - coord[:, 1, None, None, None]) / std
    dz = (gz[None] - coord[:, 2, None, None, None]) / std
    return jnp.exp(-(dx ** 2 + dy ** 2 + dz ** 2) / 2.0)


class V2VVoxelization:
    """Sample transform (reference :651-711): augmentation parameter draws
    match the reference's np.random calls; rasterization is jitted."""

    def __init__(self, cubic_size: float, augmentation: bool = True,
                 rng: np.random.RandomState | None = None):
        self.cubic_size = cubic_size
        self.cropped_size, self.original_size = 64, 96
        self.sizes = (self.cubic_size, self.cropped_size,
                      self.original_size)
        self.pool_factor = 2
        self.std = 1.7
        self.augmentation = augmentation
        self.rng = rng if rng is not None else np.random.RandomState()
        self._input = jax.jit(functools.partial(
            generate_cubic_input, sizes=self.sizes))
        self._hand = jax.jit(functools.partial(
            generate_cubic_hand, sizes=self.sizes))
        self._coord = jax.jit(functools.partial(
            generate_coord, sizes=self.sizes))
        self._heatmap = jax.jit(functools.partial(
            generate_heatmap_gt, sizes=self.sizes,
            pool_factor=self.pool_factor, std=self.std))

    def _draws(self):
        if not self.augmentation:
            return 100.0, 0.0, np.full(
                (3,), self.original_size / 2 - self.cropped_size / 2)
        new_size = self.rng.rand() * 40 + 80
        angle = self.rng.rand() * 80 / 180 * np.pi - 40 / 180 * np.pi
        trans = self.rng.rand(3) * (self.original_size - self.cropped_size)
        return new_size, angle, trans

    def __call__(self, sample: dict):
        points, keypoints, refpoint = (sample["points"],
                                       sample["keypoints"],
                                       sample["refpoint"])
        new_size, angle, trans = self._draws()
        inp = self._input(points, refpoint, new_size, angle, trans)
        hand = self._hand(keypoints, refpoint, new_size, angle, trans)
        coords = self._coord(keypoints, refpoint, new_size, angle, trans)
        return inp[None], coords, hand[None]

    def voxelize(self, points, refpoint):
        t = self.original_size / 2 - self.cropped_size / 2
        return self._input(points, refpoint, 100.0, 0.0,
                           np.full((3,), t))[None]

    def generate_heatmap(self, keypoints, refpoint):
        t = self.original_size / 2 - self.cropped_size / 2
        return self._heatmap(keypoints, refpoint, 100.0, 0.0,
                             np.full((3,), t))

    def evaluate(self, heatmaps, refpoints):
        coords = extract_coord_from_output(heatmaps) * self.pool_factor
        return warp2continuous(coords, refpoints, self.cubic_size,
                               self.cropped_size)
