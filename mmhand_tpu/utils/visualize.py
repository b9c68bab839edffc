"""Visualization utilities (reference util/util.py:15-191,
models/MMHandModel.py:343-369).

* tensor2im: [-1,1] NHWC float -> uint8 RGB.
* map_to_cords: heatmap peak extraction.
* draw_pose_from_map: skeleton render of a 21-channel heatmap — implemented
  with the on-device jointsmap rasterizer (bone ellipses), replacing the
  cv2 ellipse/polygon path of the reference.
* seven_tile_strip: the [H1,P1,D1,H2,P2,D2,fake] epoch-snapshot panel.
"""

from __future__ import annotations

import numpy as np

from mmhand_tpu.ops.jointsmap import generate_jointsmap


def tensor2im(img) -> np.ndarray:
    """[-1, 1] float (H, W, 3) or (B, H, W, 3) -> uint8, first element if
    batched (reference util/util.py:15-24)."""
    arr = np.asarray(img)
    if arr.ndim == 4:
        arr = arr[0]
    arr = (arr + 1.0) / 2.0 * 255.0
    return np.clip(arr, 0, 255).astype(np.uint8)


def map_to_cords(heatmap, threshold: float = 0.1) -> np.ndarray:
    """Per-channel argmax peak -> (K, 2) (x, y); peaks below threshold get
    (-1, -1) (reference util/util.py:94-114 map_to_cord)."""
    hm = np.asarray(heatmap)
    if hm.ndim == 4:
        hm = hm[0]
    h, w, k = hm.shape
    flat = hm.reshape(-1, k)
    idx = flat.argmax(axis=0)
    ys, xs = np.unravel_index(idx, (h, w))
    peak = flat[idx, np.arange(k)]
    cords = np.stack([xs, ys], axis=-1).astype(np.float32)
    cords[peak < threshold] = -1.0
    return cords


def draw_pose_from_map(heatmap, threshold: float = 0.1) -> np.ndarray:
    """Skeleton visualization of a heatmap (uint8 RGB)."""
    cords = map_to_cords(heatmap, threshold)
    hm = np.asarray(heatmap)
    if hm.ndim == 4:
        hm = hm[0]
    h, w = hm.shape[0], hm.shape[1]
    # uniform depth: pure 2D overlay
    jm = np.asarray(generate_jointsmap(cords, np.ones(21, np.float32), h, w))
    img = np.clip(jm, 0, 255).astype(np.uint8)
    return np.stack([img, img, img], axis=-1)


def seven_tile_strip(h1, p1, d1, h2, p2, d2, fake) -> np.ndarray:
    """[H1, P1, D1, H2, P2, D2, fake] panel
    (reference MMHandModel.py:343-369)."""
    tiles = [tensor2im(h1), draw_pose_from_map(p1), tensor2im(d1),
             tensor2im(h2), draw_pose_from_map(p2), tensor2im(d2),
             tensor2im(fake)]
    return np.concatenate(tiles, axis=1)
