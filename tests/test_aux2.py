"""Tests for MSRA reader, baseline-format exporters, HTML gallery."""

import os
import pickle
import struct

import numpy as np
import pytest
from PIL import Image

from mmhand_tpu.data.msra import (
    MSRAHandDataset,
    load_depthmap_bin,
    pixel2world,
    read_joints,
    world2pixel,
)
from mmhand_tpu.utils.html import HTMLGallery


def _write_msra_bin(path, img_w=320, img_h=240, left=100, top=80,
                    right=180, bottom=160, value=420.0):
    crop = np.full((bottom - top, right - left), value, np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("I" * 6, img_w, img_h, left, top, right, bottom))
        f.write(crop.astype("<f4").tobytes())


class TestMSRA:
    def test_depth_bin_round_trip(self, tmp_path):
        p = str(tmp_path / "000000_depth.bin")
        _write_msra_bin(p)
        depth, bbox = load_depthmap_bin(p)
        assert depth.shape == (240, 320)
        assert bbox == (100, 80, 180, 160)
        assert depth[100, 120] == 420.0
        assert depth[0, 0] == 700.0  # background at max depth

    def test_pixel_world_round_trip(self):
        x, y, z = 150.0, 100.0, 400.0
        wx, wy, wz = pixel2world(x, y, z)
        px, py = world2pixel(wx, wy, wz)
        assert px == pytest.approx(x) and py == pytest.approx(y)

    def test_dataset_listing(self, tmp_path):
        gdir = tmp_path / "P0" / "1"
        os.makedirs(gdir)
        joints = np.random.RandomState(0).uniform(-50, 50, (2, 21, 3))
        joints[..., 2] -= 400
        with open(gdir / "joint.txt", "w") as f:
            f.write("2\n")
            for fr in joints:
                f.write(" ".join(str(v) for v in fr.ravel()) + "\n")
        for i in range(2):
            _write_msra_bin(str(gdir / f"{i:06d}_depth.bin"))
        ds = MSRAHandDataset(str(tmp_path), subjects=["P0"], gestures=["1"])
        assert len(ds) == 2
        item = ds[0]
        assert item["depthmap"].shape == (240, 320)
        assert item["xyz"].shape == (21, 3)
        # sign flip applied on load
        np.testing.assert_allclose(item["xyz"][:, 1], -joints[0][:, 1],
                                   rtol=1e-5)


def _fake_crop_tree(root, n=4):
    os.makedirs(os.path.join(root, "color"), exist_ok=True)
    rng = np.random.RandomState(0)
    annos = {"color": {}}
    for i in range(n):
        name = f"{i:05d}.png"
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(os.path.join(root, "color", name))
        annos["color"][name] = {
            "uv_coord": rng.uniform(4, 28, (21, 2)),
            "depth": rng.uniform(0.2, 0.7, 21),
            "xyz": rng.uniform(size=(21, 3)), "K": np.eye(3)}
    with open(os.path.join(root, "annotation.pickle"), "wb") as f:
        pickle.dump(annos, f)


class TestExporters:
    def test_pairs_csv(self, tmp_path):
        import sys
        sys.path.insert(0, "scripts")
        from export_baseline_formats import export_pairs
        root = str(tmp_path / "crop")
        _fake_crop_tree(root)
        out = str(tmp_path / "pairs.csv")
        n = export_pairs(root, out)
        assert n == 4
        import csv
        with open(out) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["from", "to"]
        assert len(rows) == 5
        assert all(r[0].startswith("color") for r in rows[1:])

    def test_keypoints_csv_feeds_pose_maps(self, tmp_path):
        import sys
        sys.path.insert(0, "scripts")
        from export_baseline_formats import export_keypoints
        from mmhand_tpu.data.csv_dataset import compute_pose_maps
        root = str(tmp_path / "crop")
        _fake_crop_tree(root)
        out = str(tmp_path / "annos.csv")
        export_keypoints(root, out)
        n = compute_pose_maps(out, str(tmp_path / "maps"), (32, 32))
        assert n == 4
        m = np.load(tmp_path / "maps" / "color" / "00000.npy")
        assert m.shape == (32, 32, 21)

    def test_pix2pixhd_export(self, tmp_path):
        import sys
        sys.path.insert(0, "scripts")
        from export_baseline_formats import export_pix2pixhd
        root = str(tmp_path / "crop")
        _fake_crop_tree(root)
        dst = str(tmp_path / "p2phd")
        n = export_pix2pixhd(root, dst, size=32)
        assert n == 4
        labels = os.listdir(os.path.join(dst, "train_label"))
        assert len(labels) == 4
        lab = np.asarray(Image.open(
            os.path.join(dst, "train_label", labels[0])))
        assert set(np.unique(lab)) <= set([0] + list(range(10, 210, 10)))


class TestHTMLGallery:
    def test_gallery_writes_index(self, tmp_path):
        g = HTMLGallery(str(tmp_path / "web"))
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            tmp_path / "web" / "images" / "a.png")
        g.add_header("epoch 1")
        g.add_images(["a.png"], ["snapshot"])
        out = g.save()
        content = open(out).read()
        assert "epoch 1" in content and "images/a.png" in content
