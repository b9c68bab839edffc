"""Ratio-mixing dataset for the augmentation study.

Port of reference hand_pose_estimators/CVPR2020_hpm3d/data/RHD_dataset.py:
at init, a random (1-ratio) fraction of indices is marked augmented
(:105-116); for those, the image loads from the sibling directory
"{method}_{last-dir-of-dataroot}" — i.e. the output tree of scripts/aug.py
(:142-160) — or, for method "None", becomes random noise with
instance_weight=0 (the ablation).  Heatmaps use sigma=5 here (:157), vs
sigma=6 in the GAN data path; z targets are depth/0.7 (:158).

Host side supplies raw records; `make_hpe_prepare_batch` renders heatmaps
and normalizes on device.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mmhand_tpu.config import Config
from mmhand_tpu.data.annotations import load_annotations
from mmhand_tpu.ops.heatmap import gaussian_heatmaps
from mmhand_tpu.ops.image import normalize_image

HPE_SIGMA = 5.0   # reference RHD_dataset.py:157
Z_SCALE = 0.7     # reference RHD_dataset.py:158 depth/0.7


def augmentation_dir_for(dataroot: str, method: str) -> str:
    """Sibling dir '{method}_{leaf}' (reference RHD_dataset.py:107-110)."""
    root = os.path.normpath(dataroot)
    parent, leaf = os.path.split(root)
    return os.path.join(parent, f"{method}_{leaf}")


class HPEMixDataset:
    """Single-image items over an RHD/STB crop tree with real/synthetic
    mixing.  Listing mirrors the GAN datasets (color images only)."""

    def __init__(self, cfg: Config, is_train: bool = True,
                 length_for_synthetic: int = 64):
        self.cfg = cfg
        self.is_train = is_train
        self.size = cfg.model.fine_size
        self.method = cfg.data.augmentation_method
        self.rng = np.random.default_rng(cfg.data.seed)

        if cfg.data.dataset.lower() == "synthetic":
            self.paths = [f"synthetic://{i:05d}.png"
                          for i in range(length_for_synthetic)]
            self.annotations = None
        else:
            self.annotations = load_annotations(cfg.data.dataroot)
            self.paths = self._list_images()

        self.augmentation_map = np.zeros(len(self.paths), bool)
        if is_train:
            self.augmentation_dir = augmentation_dir_for(
                cfg.data.dataroot or "synthetic", self.method)
            n_aug = int((1 - cfg.data.augmentation_ratio) * len(self.paths))
            picks = self.rng.choice(len(self.paths), size=n_aug, replace=False)
            self.augmentation_map[picks] = True

    def _list_images(self):
        root = self.cfg.data.dataroot
        name = self.cfg.data.dataset.lower()
        out = []
        if name == "rhd":
            for image in self.annotations.get("color", {}):
                out.append(os.path.join(root, "color", image))
        else:  # stb
            for folder, images in self.annotations.items():
                for image in images:
                    parts = image.split("_")
                    if len(parts) >= 3 and parts[0] != "BB" \
                            and parts[1] == "color":
                        out.append(os.path.join(root, folder, image))
        return sorted(out)

    def __len__(self):
        return len(self.paths)

    def update_parameters(self):
        """Curriculum hook (reference data/base_dataset.py:62-67, called
        every 5 epochs from train.py:89-91): each `updatable_<name>`
        attribute is bumped by the matching `step_<name>`.  The reference's
        only consumer is the MSRA rotation-augmentation curriculum
        (msrahand_dataset.py:740-741); any subclass/instance attr pair
        participates here the same way."""
        for k, v in list(self.__dict__.items()):
            parts = k.split("_")
            if parts[0] == "updatable":
                setattr(self, k,
                        v + getattr(self, "step_" + "_".join(parts[1:])))

    def _labels(self, path: str):
        if self.annotations is None:
            rng = np.random.default_rng(abs(hash(path)) % (2 ** 63))
            m = min(20, self.size // 4)
            return {"uv_coord": rng.uniform(m, self.size - m, (21, 2)),
                    "depth": rng.uniform(0.1, 0.7, (21,))}
        folder, name = path.split(os.sep)[-2], os.path.basename(path)
        return self.annotations[folder][name]

    def load_item(self, index: int) -> dict:
        path = self.paths[index]
        labels = self._labels(path)
        weight = 1
        if self.annotations is None:
            rng = np.random.default_rng(abs(hash(path)) % (2 ** 63) + 1)
            image = rng.integers(0, 256, (self.size, self.size, 3), np.uint8)
        elif self.is_train and self.augmentation_map[index]:
            if self.method == "None":
                # noise ablation sample (reference RHD_dataset.py:145-148)
                image = (np.random.random((self.size, self.size, 3))
                         * 255).astype(np.uint8)
                weight = 0
            else:
                folder = path.split(os.sep)[-2]
                name = os.path.basename(path)
                aug_path = os.path.join(self.augmentation_dir, folder, name)
                image = np.asarray(Image.open(aug_path).convert("RGB"),
                                   np.uint8)
        else:
            image = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        return {
            "image": image,
            "uv": np.asarray(labels["uv_coord"], np.float32),
            "z": np.asarray(labels["depth"], np.float32) / Z_SCALE,
            "weight": np.int32(weight),
            "path": path,
        }

    def batch(self, indices) -> dict:
        items = [self.load_item(int(i)) for i in indices]
        return {
            "image": np.stack([it["image"] for it in items]),
            "uv": np.stack([it["uv"] for it in items]),
            "z": np.stack([it["z"] for it in items]),
            "weight": np.stack([it["weight"] for it in items]),
        }


class BinDBDataset:
    """HPE training batches straight from a hand3d packed binary GAN DB
    (scripts/create_hand3d_db.py output) — the in-framework replacement for
    the reference's TF BinaryDbReader_gan fine-tuning path
    (reference hand_pose_estimators/CVPR2020_hand3d/data/BinaryDbReader_gan.py
    role)."""

    def __init__(self, bin_path: str, size: int = 256):
        from mmhand_tpu.data.hand3d_binary import Hand3dBinaryDataset

        self.db = Hand3dBinaryDataset(bin_path, size, size)
        self.size = size

    def __len__(self):
        return len(self.db)

    def batch(self, indices) -> dict:
        recs = [self.db[int(i)] for i in indices]
        return {
            "image": np.stack([r["image"] for r in recs]),
            "uv": np.stack([r["uv"][:21] for r in recs]).astype(np.float32),
            "z": np.stack([r["xyz"][:21, 2] for r in recs]).astype(
                np.float32) / Z_SCALE,
            "weight": np.ones(len(recs), np.int32),
        }


def make_hpe_prepare_batch(sigma: float = HPE_SIGMA):
    """Raw host batch -> device batch with sigma-5 heatmaps."""

    @jax.jit
    def prepare(raw):
        size = raw["image"].shape[1]
        return {
            "image": normalize_image(raw["image"]),
            "heatmaps": gaussian_heatmaps(raw["uv"], size, size, sigma),
            "z": jnp.asarray(raw["z"], jnp.float32),
            "weight": jnp.asarray(raw["weight"], jnp.int32),
        }

    return prepare
