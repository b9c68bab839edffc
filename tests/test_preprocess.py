"""Preprocessing CLI tests: build tiny fake RHD/STB sources, run the crop
builders, and load the outputs through the training datasets (full
interchange-format round trip)."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mmhand_tpu.config import Config, DataConfig, ModelConfig
from mmhand_tpu.data import RHDCrops, STBCrops
from mmhand_tpu.data.preprocess import (
    STB_TO_STD,
    create_rhd_db,
    create_stb_db,
    project_points,
    stb_uv_coord,
)


class TestProjectPoints:
    def test_identity_projection(self):
        k = np.array([[100.0, 0, 50], [0, 100.0, 60], [0, 0, 1]])
        xyz = np.array([[0.0, 0.0, 1.0], [0.1, -0.2, 2.0]])
        uv = project_points(xyz, np.zeros(3), np.zeros(3), k)
        np.testing.assert_allclose(uv[0], [50, 60], atol=1e-9)
        np.testing.assert_allclose(uv[1], [100 * 0.05 + 50, 100 * -0.1 + 60],
                                   atol=1e-9)

    def test_rotation_vector(self):
        # 90 degrees about z: (1,0,5) -> (0,1,5)
        k = np.eye(3)
        uv = project_points(np.array([[1.0, 0.0, 5.0]]),
                            np.array([0, 0, np.pi / 2]), np.zeros(3), k)
        np.testing.assert_allclose(uv[0], [0.0, 1.0 / 5.0 * 5 / 5], atol=1e-9)

    def test_stb_sk_color_uses_extrinsics(self):
        xyz = np.array([[10.0, -20.0, 500.0]] * 21)
        uv_color = stb_uv_coord("color", "SK", xyz)
        uv_depth = stb_uv_coord("depth", "SK", xyz)
        assert not np.allclose(uv_color, uv_depth)


def _fake_rhd_source(root, n_frames=3):
    """RHD layout: <split>/anno_<split>.pickle + color/depth/mask pngs."""
    split_dir = os.path.join(root, "evaluation")
    rng = np.random.RandomState(0)
    annos = {}
    for kind in ("color", "depth", "mask"):
        os.makedirs(os.path.join(split_dir, kind), exist_ok=True)
    for i in range(n_frames):
        name = f"{i:05d}.png"
        img = rng.randint(0, 255, (320, 320, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(split_dir, "color", name))
        Image.fromarray(img[::-1]).save(os.path.join(split_dir, "depth", name))
        mask = np.full((320, 320), 5, np.uint8)  # hand present
        Image.fromarray(mask).save(os.path.join(split_dir, "mask", name))
        uv = rng.uniform(60, 260, (21, 2))
        annos[i] = {
            "K": np.array([[614.878, 0, 313.219], [0, 615.479, 231.288],
                           [0, 0, 1.0]]),
            "uv_vis": np.concatenate([uv, np.ones((21, 1))], 1),
            "xyz": rng.uniform(-0.1, 0.1, (21, 3)) + [0, 0, 0.5],
        }
    with open(os.path.join(split_dir, "anno_evaluation.pickle"), "wb") as f:
        pickle.dump(annos, f)


class TestCreateRHD:
    def test_round_trip(self, tmp_path):
        src = str(tmp_path / "rhd_src")
        dst = str(tmp_path / "rhd_crop")
        _fake_rhd_source(src)
        n = create_rhd_db(src, dst, 64, workers=2)
        assert n == 3
        assert os.path.exists(os.path.join(dst, "annotation.pickle"))
        # load through the training dataset
        cfg = Config(model=ModelConfig(fine_size=64),
                     data=DataConfig(dataset="RHD", dataroot=dst,
                                     augmentation_ratio=1.0))
        ds = RHDCrops(cfg)
        assert len(ds) == 3
        src_item, tgt_item = ds.load_pair(0)
        assert src_item.image.shape == (64, 64, 3)
        assert src_item.uv.shape == (21, 2)
        # uv must live inside the crop
        assert src_item.uv.min() >= 0 and src_item.uv.max() <= 64

    def test_invisible_keypoints_rejected(self, tmp_path):
        src = str(tmp_path / "rhd_src")
        _fake_rhd_source(src, n_frames=2)
        # make frame 1 partially invisible
        p = os.path.join(src, "evaluation", "anno_evaluation.pickle")
        with open(p, "rb") as f:
            annos = pickle.load(f)
        annos[1]["uv_vis"][:3, -1] = 0
        with open(p, "wb") as f:
            pickle.dump(annos, f)
        n = create_rhd_db(src, str(tmp_path / "crop"), 64, workers=1)
        assert n == 1

    def test_two_hand_split(self, tmp_path):
        src = str(tmp_path / "rhd_src")
        _fake_rhd_source(src, n_frames=1)
        p = os.path.join(src, "evaluation", "anno_evaluation.pickle")
        with open(p, "rb") as f:
            annos = pickle.load(f)
        a = annos[0]
        rng = np.random.RandomState(1)
        uv2 = rng.uniform(60, 260, (42, 2))
        annos[0] = {
            "K": a["K"],
            "uv_vis": np.concatenate([uv2, np.ones((42, 1))], 1),
            "xyz": np.tile(a["xyz"], (2, 1)),
        }
        with open(p, "wb") as f:
            pickle.dump(annos, f)
        n = create_rhd_db(src, str(tmp_path / "crop"), 64, workers=1)
        assert n == 2  # left + right


def _fake_stb_source(root, frames=2):
    from scipy.io import savemat
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for seq in ["B1Counting", "B4Counting"]:
        os.makedirs(os.path.join(root, seq), exist_ok=True)
        # handPara: (3, 21, 1500) mm, positioned in front of the camera
        hand = rng.uniform(-30, 30, (3, 21, 1500))
        hand[2] += 500.0
        savemat(os.path.join(root, "labels", f"{seq}_SK.mat"),
                {"handPara": hand})
        for i in range(frames):
            img = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, seq, f"SK_color_{i}.png"))


class TestCreateSTB:
    def test_round_trip_and_split(self, tmp_path):
        src = str(tmp_path / "stb_src")
        dst = str(tmp_path / "stb_crop")
        _fake_stb_source(src)
        counts = create_stb_db(src, dst, 64, workers=2)
        assert counts == {"train": 2, "test": 2}  # B1 -> train, B4 -> test
        cfg = Config(model=ModelConfig(fine_size=64),
                     data=DataConfig(dataset="STB",
                                     dataroot=os.path.join(dst, "train"),
                                     augmentation_ratio=1.0))
        ds = STBCrops(cfg)
        assert len(ds) == 2
        # depth image is color-replaced? no depth tree for STB: loader reads
        # color path with 'depth' substitution — STB crops have no depth
        # imagery, so only annotation access is exercised here
        anno = ds.get_labels(ds.image_target[0])
        assert np.asarray(anno["uv_coord"]).shape == (21, 2)

    def test_stb_to_std_is_permutation(self):
        assert sorted(STB_TO_STD) == list(range(21))
