"""Market-1501/PATN-style CSV pair dataset + pose-map generation.

Ports of:
* MMHandDataset (reference data/mmhand_dataset.py:14-118): pair list CSV
  (from,to), image + precomputed `.npy` 21-channel pose map + depth image
  (path color->depth), optional LR flip; train draws a random index per
  __getitem__ — making an "epoch" statistical (reference :45-46; preserved
  via `sample_random`).
* cords_to_map / compute_pose (reference tool/generate_pose_map_RHD.py:22-50
  and its 4 near-identical dataset variants): CSV with keypoints_y /
  keypoints_x JSON columns -> sigma-6 Gaussian .npy maps, MISSING_VALUE=-1
  keypoints skipped.  One parameterized implementation replaces the five
  copies.
"""

from __future__ import annotations

import json
import os
import random
from typing import Optional

import numpy as np
from PIL import Image

MISSING_VALUE = -1


def cords_to_map(cords, img_size=(256, 256), sigma: float = 6.0) -> np.ndarray:
    """(K, 2) (y, x) coords -> (H, W, K) float32 Gaussian maps
    (reference generate_pose_map_RHD.py:22-29; NO sparsity clip here,
    unlike the GAN loader's heatmaps — parity preserved)."""
    cords = np.asarray(cords, np.float64)
    h, w = img_size
    result = np.zeros((h, w, cords.shape[0]), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for i, (cy, cx) in enumerate(cords):
        if cy == MISSING_VALUE or cx == MISSING_VALUE:
            continue
        result[..., i] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                                / (2 * sigma ** 2))
    return result


def load_pose_cords_from_strings(y_str: str, x_str: str) -> np.ndarray:
    """JSON '[y...]'/'[x...]' -> (K, 2) (y, x)
    (reference generate_pose_map_RHD.py:16-20)."""
    y = json.loads(y_str)
    x = json.loads(x_str)
    return np.stack([np.asarray(y), np.asarray(x)], axis=1)


def compute_pose_maps(annotations_csv: str, save_path: str,
                      img_size=(256, 256), sigma: float = 6.0,
                      sep: str = ":") -> int:
    """Render all pose maps for a CSV annotation file
    (reference generate_pose_map_*.py compute_pose)."""
    import pandas as pd

    df = pd.read_csv(annotations_csv, sep=sep).set_index("name")
    os.makedirs(save_path, exist_ok=True)
    for name, row in df.iterrows():
        cords = load_pose_cords_from_strings(row["keypoints_y"],
                                             row["keypoints_x"])
        out = os.path.join(save_path, str(name) + ".npy")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, cords_to_map(cords, img_size, sigma))
    return len(df)


class MMHandCSVDataset:
    """Paired dataset over a CSV pair list + precomputed pose maps.

    `prerendered = True` marks the HostLoader protocol variant: items are
    already full float32 H1..D2 dicts (pose maps come precomputed from
    `.npy`, depth is an RGB image normalized like the hand image —
    reference data/mmhand_dataset.py:73-106), so the device prepare step is
    a passthrough instead of the heatmap/depth renderer.
    """

    prerendered = True

    def __init__(self, image_root: str, pose_root: str, pair_lst: str,
                 phase: str = "train", use_flip: bool = False,
                 seed: Optional[int] = None):
        import pandas as pd

        self.dir_h = os.path.join(image_root, phase)
        self.dir_p = os.path.join(pose_root, phase + "P")
        self.phase = phase
        self.use_flip = use_flip
        self.rng = random.Random(seed)
        pairs = pd.read_csv(pair_lst)
        self.pairs = [[pairs.iloc[i]["from"], pairs.iloc[i]["to"]]
                      for i in range(len(pairs))]

    @classmethod
    def from_config(cls, cfg) -> "MMHandCSVDataset":
        """Build from the Config flag surface (--imageroot/--poseroot/
        --pairLst/--use_flip/--phase; reference
        data/mmhand_dataset_data_loader.py:12-17 + options/base_options.py:
        16-19,126-128)."""
        if not cfg.data.pair_lst:
            raise ValueError("--dataset MMHand requires --pairLst")
        return cls(image_root=cfg.data.image_root or cfg.data.dataroot,
                   pose_root=cfg.data.pose_root or cfg.data.dataroot,
                   pair_lst=cfg.data.pair_lst,
                   phase=cfg.run.phase if not cfg.is_train else "train",
                   use_flip=cfg.data.use_flip,
                   seed=cfg.data.seed)

    def __len__(self):
        return len(self.pairs)

    def _paths(self, name: str):
        img = name if name.endswith(".png") else name + ".png"
        h = os.path.join(self.dir_h, img)
        p = os.path.join(self.dir_p, name + ".npy")
        d = h.replace("color", "depth")
        return h, p, d

    def __getitem__(self, index: int) -> dict:
        if self.phase == "train":
            # statistical epoch: random index per draw (reference :45-46)
            index = self.rng.randint(0, len(self.pairs) - 1)
        h1_name, h2_name = self.pairs[index]

        def load(name):
            h_path, p_path, d_path = self._paths(name)
            img = np.asarray(Image.open(h_path).convert("RGB"), np.uint8)
            pose = np.load(p_path).astype(np.float32)  # (H, W, K)
            depth = np.asarray(Image.open(d_path).convert("RGB"), np.uint8)
            return img, pose, depth

        h1, p1, d1 = load(h1_name)
        h2, p2, d2 = load(h2_name)

        if self.phase == "train" and self.use_flip \
                and self.rng.uniform(0, 1) > 0.5:
            h1, h2 = h1[:, ::-1], h2[:, ::-1]
            p1, p2 = p1[:, ::-1], p2[:, ::-1]
            d1, d2 = d1[:, ::-1], d2[:, ::-1]

        def norm(img):
            return ((np.asarray(img, np.float32) / 255.0) - 0.5) / 0.5

        return {
            "H1": norm(h1), "P1": np.ascontiguousarray(p1), "D1": norm(d1),
            "H2": norm(h2), "P2": np.ascontiguousarray(p2), "D2": norm(d2),
            "H1_path": h1_name, "H2_path": h2_name,
        }
