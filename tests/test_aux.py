"""Tests for auxiliary components: pose NN search, CSV pair dataset +
pose-map generation, hand3d binary DB round trip."""

import os

import numpy as np
import pytest
from PIL import Image

from mmhand_tpu.data.csv_dataset import (
    MMHandCSVDataset,
    compute_pose_maps,
    cords_to_map,
    load_pose_cords_from_strings,
)
from mmhand_tpu.data.hand3d_binary import (
    add_padding,
    read_record,
    record_size,
    write_gan_db,
    write_record,
)
from mmhand_tpu.eval.pose_search import (
    bone_difference_vectors,
    knn_embedding,
    knn_pose_distance,
    pose_distance,
    pose_embedding,
)


class TestPoseSearch:
    def _pose(self, seed=0):
        return np.random.RandomState(seed).uniform(-1, 1, (21, 3))

    def test_distance_identity_zero(self):
        p = self._pose()
        assert pose_distance(p, p) == pytest.approx(0.0, abs=1e-9)

    def test_distance_symmetric_and_bounded(self):
        a, b = self._pose(1), self._pose(2)
        d1, d2 = pose_distance(a, b), pose_distance(b, a)
        assert d1 == pytest.approx(d2)
        assert 0.0 <= d1 <= 1.0

    def test_knn_finds_self_first(self):
        db = np.stack([self._pose(i) for i in range(50)])
        idx, dist = knn_pose_distance(db[7], db, k=5)
        assert idx[0] == 7
        assert dist[0] == pytest.approx(0.0, abs=1e-9)
        assert np.all(np.diff(dist) >= 0)

    def test_knn_matches_scalar_metric(self):
        db = np.stack([self._pose(i) for i in range(20)])
        q = self._pose(100)
        idx, dist = knn_pose_distance(q, db, k=20)
        scalar = np.array([pose_distance(q, db[i]) for i in range(20)])
        np.testing.assert_allclose(dist, np.sort(scalar), atol=1e-9)

    def test_embedding_shape_and_knn(self):
        xyz = self._pose()
        uv = np.random.RandomState(0).uniform(0, 256, (21, 2))
        emb = pose_embedding(xyz, uv)
        assert emb.shape == (9,)  # centroid 3 + tips 5 + sqrt(area)
        db = np.stack([pose_embedding(self._pose(i),
                                      uv + i) for i in range(10)])
        idx, _ = knn_embedding(db[3], db, k=3)
        assert idx[0] == 3

    def test_bone_diff_shape(self):
        assert bone_difference_vectors(self._pose()).shape == (60,)


class TestPoseMaps:
    def test_cords_to_map_peak_and_missing(self):
        cords = np.array([[10, 20], [-1, -1]])  # (y, x); second missing
        m = cords_to_map(cords, (32, 32), sigma=6.0)
        assert m.shape == (32, 32, 2)
        assert m[10, 20, 0] == pytest.approx(1.0)
        assert m[..., 1].max() == 0.0

    def test_load_cords_json(self):
        cords = load_pose_cords_from_strings("[1, 2]", "[3, 4]")
        np.testing.assert_array_equal(cords, [[1, 3], [2, 4]])

    def test_compute_pose_maps(self, tmp_path):
        import pandas as pd
        csv = tmp_path / "annos.csv"
        pd.DataFrame({
            "name": ["a", "b"],
            "keypoints_y": ["[5, 10]", "[1, 2]"],
            "keypoints_x": ["[6, 11]", "[3, 4]"],
        }).to_csv(csv, sep=":", index=False)
        n = compute_pose_maps(str(csv), str(tmp_path / "maps"), (16, 16))
        assert n == 2
        m = np.load(tmp_path / "maps" / "a.npy")
        assert m.shape == (16, 16, 2)
        assert m[5, 6, 0] == pytest.approx(1.0)


class TestCSVDataset:
    def _build(self, tmp_path, use_flip=False):
        import pandas as pd
        rng = np.random.RandomState(0)
        img_root = tmp_path / "imgs"
        pose_root = tmp_path / "poses"
        os.makedirs(img_root / "train")
        os.makedirs(pose_root / "trainP")
        for name in ["color_0", "color_1"]:
            img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(img).save(img_root / "train" / f"{name}.png")
            depth_name = name.replace("color", "depth")
            Image.fromarray(img[::-1]).save(
                img_root / "train" / f"{depth_name}.png")
            np.save(pose_root / "trainP" / f"{name}.npy",
                    rng.uniform(0, 1, (32, 32, 21)).astype(np.float32))
        pairs = tmp_path / "pairs.csv"
        pd.DataFrame({"from": ["color_0"], "to": ["color_1"]}).to_csv(
            pairs, index=False)
        return MMHandCSVDataset(str(img_root), str(pose_root), str(pairs),
                                phase="train", use_flip=use_flip, seed=0)

    def test_item_contract(self, tmp_path):
        ds = self._build(tmp_path)
        item = ds[0]
        assert item["H1"].shape == (32, 32, 3)
        assert item["P1"].shape == (32, 32, 21)
        assert item["D1"].shape == (32, 32, 3)
        assert -1.0 <= item["H1"].min() and item["H1"].max() <= 1.0
        assert item["H1_path"] == "color_0"


class TestHand3dBinary:
    def test_round_trip(self, tmp_path):
        rng = np.random.RandomState(0)
        sample = {
            "image": rng.randint(0, 255, (256, 256, 3), dtype=np.uint8),
            "uv": rng.uniform(0, 256, (21, 2)).astype(np.float32),
            "xyz": rng.uniform(-1, 1, (21, 3)).astype(np.float32),
            "K": np.eye(3, dtype=np.float32),
        }
        out = str(tmp_path / "gan.bin")
        n = write_gan_db(out, [sample, sample])
        assert n == 2
        assert os.path.getsize(out) == 2 * record_size()
        with open(out, "rb") as fh:
            rec = read_record(fh)
            rec2 = read_record(fh)
        np.testing.assert_array_equal(rec["image"], sample["image"])
        np.testing.assert_allclose(rec["uv"][:21], sample["uv"], rtol=1e-6)
        np.testing.assert_allclose(rec["xyz"][:21], sample["xyz"], rtol=1e-6)
        np.testing.assert_array_equal(rec["uv"][21:], 0)
        assert rec["visible"][:21].all() and not rec["visible"][21:].any()
        np.testing.assert_array_equal(rec2["K"], np.eye(3))

    def test_padding(self):
        padded = add_padding(np.ones((21, 3), np.float32))
        assert padded.shape == (42, 3)
        assert padded[21:].sum() == 0


class TestLivePlot:
    """Serverless visdom replacement (utils/liveplot.py; reference
    util/visualizer.py:100-113 plot_current_errors)."""

    def test_add_writes_svg_html_json_and_resumes(self, tmp_path):
        from mmhand_tpu.utils.liveplot import LossPlot
        web = str(tmp_path / "web")
        p = LossPlot(web, title="exp")
        p.add(1.0, {"pair_L1loss": 3.0, "D_PP": 1.5})
        p.add(1.5, {"pair_L1loss": 2.0, "D_PP": 1.4})
        svg = open(os.path.join(web, "losses.svg")).read()
        assert "<polyline" in svg and "pair_L1loss" in svg and "D_PP" in svg
        html = open(os.path.join(web, "losses.html")).read()
        assert 'http-equiv="refresh"' in html and "<svg" in html
        # legend is fixed at the first call (reference :101-104): a key
        # appearing later is ignored, a missing key becomes a gap
        p.add(2.0, {"pair_L1loss": 1.0, "new_key": 9.0})
        assert p.legend == ["pair_L1loss", "D_PP"]
        # resume continues the curve from plot_data.json
        q = LossPlot(web, title="exp")
        assert q.xs == [1.0, 1.5, 2.0] and q.legend == p.legend
        q.add(2.5, {"pair_L1loss": 0.5, "D_PP": 1.0})
        assert len(q.xs) == 4

    def test_render_svg_gaps_and_degenerate(self):
        from mmhand_tpu.utils.liveplot import render_svg
        svg = render_svg([0.0, 1.0, 2.0],
                         [[1.0, float("nan")], [None, 2.0], [3.0, 2.5]],
                         ["a", "b"])
        assert svg.count("<circle") >= 1  # isolated point drawn as a dot
        assert "<polyline" in svg
        # single point, constant value: no division by zero
        svg2 = render_svg([0.5], [[1.0]], ["only"])
        assert "<svg" in svg2 and "only" in svg2

    def test_visualizer_gate_and_wiring(self, tmp_path):
        from mmhand_tpu.utils.logging import Visualizer
        vis = Visualizer(str(tmp_path), "exp", master=False)
        vis.plot_current_errors(1, 0.0, {"x": 1.0})  # no-op, no files
        assert not os.path.exists(os.path.join(str(tmp_path), "exp", "web"))
        vis2 = Visualizer(str(tmp_path), "exp", master=True)
        vis2.plot_current_errors(1, 0.25, {"x": 1.0})
        assert os.path.exists(
            os.path.join(str(tmp_path), "exp", "web", "losses.html"))


class TestLazyAOT:
    """utils/runtime.lazy_aot: on the CPU test backend the host-trace path
    is skipped (assert inside), so the wrapper must transparently fall back
    to the plain jitted callable — results and shape-polymorphism (re-trace
    on new shapes) preserved."""

    def test_passthrough_and_shape_change(self):
        import jax
        import jax.numpy as jnp

        from mmhand_tpu.utils.runtime import lazy_aot

        calls = []

        @jax.jit
        def f(x):
            calls.append(1)  # traced once per shape
            return x * 2.0 + 1.0

        g = lazy_aot(f)
        a = jnp.arange(4.0)
        np.testing.assert_allclose(np.asarray(g(a)), np.asarray(f(a)))
        b = jnp.arange(8.0)  # new shape: must re-trace, not crash
        np.testing.assert_allclose(np.asarray(g(b)), np.asarray(b * 2 + 1))
