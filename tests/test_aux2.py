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


class TestPoseDrawing:
    def test_labelcolormap_shape_and_xor(self):
        from mmhand_tpu.utils.visualize import labelcolormap
        cm = labelcolormap(22)
        assert cm.shape == (22, 3)
        assert (cm[0] == 0).all()
        # distinct colors for the used labels
        assert len({tuple(c) for c in cm}) == 22

    def test_draw_pose_from_cords(self):
        import numpy as np
        from mmhand_tpu.utils.visualize import draw_pose_from_cords
        rng = np.random.RandomState(0)
        cords = rng.uniform(30, 220, (21, 2)).astype(np.float32)
        img = draw_pose_from_cords(cords, (256, 256))
        assert img.shape == (256, 256, 3)
        assert img.max() > 0  # something drawn

    def test_draw_pose_missing_joints_safe(self):
        import numpy as np
        from mmhand_tpu.utils.visualize import draw_pose_from_cords
        cords = np.full((21, 2), -1.0, np.float32)
        img = draw_pose_from_cords(cords, (64, 64))
        assert img.sum() == 0  # nothing drawn, no crash


class TestBaselineDiscriminators:
    def test_nlayer_patchgan(self):
        import jax, jax.numpy as jnp
        from mmhand_tpu.models.baselines import NLayerDiscriminator
        d = NLayerDiscriminator(ndf=16, dtype=jnp.float32)
        v = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)),
                   train=False)
        out = d.apply(v, jnp.zeros((1, 64, 64, 6)), train=False)
        assert out.shape[-1] == 1 and out.shape[1] < 64  # patch logits

    def test_pixel_discriminator(self):
        import jax, jax.numpy as jnp
        from mmhand_tpu.models.baselines import PixelDiscriminator
        d = PixelDiscriminator(ndf=16, dtype=jnp.float32)
        v = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
        out = d.apply(v, jnp.zeros((1, 32, 32, 3)), train=False)
        assert out.shape == (1, 32, 32, 1)


class TestHand3dDataset:
    def test_binary_dataset(self, tmp_path):
        import numpy as np
        from mmhand_tpu.data.hand3d_binary import (
            Hand3dBinaryDataset, write_gan_db)
        rng = np.random.RandomState(0)
        samples = [{
            "image": rng.randint(0, 255, (64, 64, 3), dtype=np.uint8),
            "uv": rng.uniform(0, 64, (21, 2)).astype(np.float32),
            "xyz": rng.uniform(-1, 1, (21, 3)).astype(np.float32),
            "K": np.eye(3, dtype=np.float32)} for _ in range(3)]
        out = str(tmp_path / "db.bin")
        write_gan_db(out, samples)
        ds = Hand3dBinaryDataset(out, 64, 64)
        assert len(ds) == 3
        rec = ds[2]
        np.testing.assert_array_equal(rec["image"], samples[2]["image"])
