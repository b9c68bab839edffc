"""Data-layer tests: split semantics parity, dataset listing over a fake
crop tree, loader determinism/sharding, and the on-device batch renderer."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mmhand_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
)
from mmhand_tpu.data import (
    HostLoader,
    RHDCrops,
    STBCrops,
    SyntheticHands,
    build_dataset,
    make_prepare_batch,
    split_src_tgt,
)
from mmhand_tpu.data.loader import epoch_permutation, host_shard


class TestSplit:
    """reference data/generic_dataset.py:96-128 _get_src_tgt semantics."""

    def _rng(self):
        return np.random.default_rng(0)

    def test_train_keeps_last_ratio_fraction(self):
        data = [f"{i:03d}.png" for i in range(10)]
        src, tgt = split_src_tgt(data, 0.8, is_train=True,
                                 root_dir="/d/train", rng=self._rng())
        # sep = int((1-0.8)*10) = int(1.9999...) = 1 — the reference's float
        # truncation (generic_dataset.py:112) is reproduced deliberately
        assert tgt == data[1:]
        assert sorted(src) == sorted(tgt)

    def test_generate_mode_takes_complement(self):
        data = [f"{i:03d}.png" for i in range(10)]
        _, tgt = split_src_tgt(data, 0.8, is_train=False,
                               root_dir="/d/train", rng=self._rng())
        assert tgt == data[:1]  # int((1-0.8)*10) = 1, see above

    def test_test_dir_uses_all(self):
        data = [f"{i:03d}.png" for i in range(10)]
        _, tgt = split_src_tgt(data, 0.8, is_train=False,
                               root_dir="/d/test", rng=self._rng())
        assert tgt == data

    def test_ratio_one_train_uses_all(self):
        data = list("abcdef")
        _, tgt = split_src_tgt(data, 1.0, is_train=True,
                               root_dir="/d/train", rng=self._rng())
        assert tgt == sorted(data)

    def test_sources_are_shuffled_pairing(self):
        data = [f"{i:03d}" for i in range(100)]
        src, tgt = split_src_tgt(data, 1.0, is_train=True,
                                 root_dir="/d/train", rng=self._rng())
        assert src != tgt and sorted(src) == sorted(tgt)


def _write_fake_rhd(root, n=6, size=32):
    os.makedirs(os.path.join(root, "color"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rng = np.random.RandomState(0)
    annos = {"color": {}, "depth": {}, "mask": {}}
    for i in range(n):
        name = f"{i:05d}.png"
        img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, "color", name))
        Image.fromarray(img[::-1]).save(os.path.join(root, "depth", name))
        anno = {"K": np.eye(3), "uv_coord": rng.uniform(5, size - 5, (21, 2)),
                "xyz": rng.uniform(size=(21, 3)),
                "depth": rng.uniform(100, 600, 21)}
        for f in annos:
            annos[f][name] = anno
    with open(os.path.join(root, "annotation.pickle"), "wb") as fh:
        pickle.dump(annos, fh)


def _write_fake_stb(root, size=32):
    rng = np.random.RandomState(0)
    annos = {}
    for folder in ["B1Counting", "B2Random"]:
        os.makedirs(os.path.join(root, folder), exist_ok=True)
        annos[folder] = {}
        for cam in ["SK", "BB"]:
            for i in range(3):
                name = f"{cam}_color_{i}.png"
                img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                Image.fromarray(img).save(os.path.join(root, folder, name))
                annos[folder][name] = {
                    "k": np.eye(3),
                    "uv_coord": rng.uniform(5, size - 5, (21, 2)),
                    "xyz": rng.uniform(size=(21, 3)),
                    "depth": rng.uniform(100, 600, 21)}
    with open(os.path.join(root, "annotation.pickle"), "wb") as fh:
        pickle.dump(annos, fh)


def _cfg(root, dataset, size=32, ratio=1.0, bsz=2):
    return Config(
        model=ModelConfig(fine_size=size),
        data=DataConfig(dataset=dataset, dataroot=root, batch_size=bsz,
                        augmentation_ratio=ratio))


class TestDatasets:
    def test_rhd_listing_and_pair_loading(self, tmp_path):
        root = str(tmp_path / "rhd_train")
        _write_fake_rhd(root)
        ds = RHDCrops(_cfg(root, "RHD"))
        assert len(ds) == 6
        src, tgt = ds.load_pair(0)
        assert src.image.shape == (32, 32, 3) and src.image.dtype == np.uint8
        assert src.depth.dtype == np.uint16
        assert src.uv.shape == (21, 2) and src.z.shape == (21,)

    def test_rhd_ratio_split(self, tmp_path):
        root = str(tmp_path / "rhd_train")
        _write_fake_rhd(root, n=10)
        ds = RHDCrops(_cfg(root, "RHD", ratio=0.6))
        assert len(ds) == 6  # last 60%
        names = sorted(os.path.basename(p) for p in ds.image_target)
        assert names[0] == "00004.png"

    def test_stb_skips_bb_camera(self, tmp_path):
        root = str(tmp_path / "stb_train")
        _write_fake_stb(root)
        ds = STBCrops(_cfg(root, "STB"))
        assert len(ds) == 6  # 2 folders x 3 SK frames; BB skipped
        assert all("SK_color" in p for p in ds.image_target)

    def test_factory(self, tmp_path):
        root = str(tmp_path / "rhd_train")
        _write_fake_rhd(root)
        assert isinstance(build_dataset(_cfg(root, "RHD")), RHDCrops)
        assert isinstance(build_dataset(_cfg("", "synthetic")), SyntheticHands)


class TestLoader:
    def test_epoch_permutation_deterministic(self):
        a = epoch_permutation(100, seed=49, epoch=3)
        b = epoch_permutation(100, seed=49, epoch=3)
        c = epoch_permutation(100, seed=49, epoch=4)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_host_shards_are_disjoint(self):
        perm = epoch_permutation(100, 0, 0)
        shards = [host_shard(perm, h, 4) for h in range(4)]
        all_idx = np.concatenate(shards)
        assert len(all_idx) == 100 and len(set(all_idx.tolist())) == 100

    def test_loader_batches(self):
        cfg = _cfg("", "synthetic", size=32, bsz=4)
        ds = SyntheticHands(cfg, length=10)
        loader = HostLoader(ds, 4, seed=1)
        batches = list(loader.epoch(0))
        assert len(batches) == 2  # drop_last
        b = batches[0]
        assert b["src_image"].shape == (4, 32, 32, 3)
        assert b["tgt_uv"].shape == (4, 21, 2)
        assert len(b["tgt_paths"]) == 4

    def test_prepare_batch_rendering(self):
        cfg = _cfg("", "synthetic", size=32, bsz=2)
        ds = SyntheticHands(cfg, length=4)
        loader = HostLoader(ds, 2, seed=1)
        raw = next(iter(loader.epoch(0)))
        prep = make_prepare_batch(sigma=6.0)
        batch = prep({k: v for k, v in raw.items() if not k.endswith("paths")})
        assert batch["H1"].shape == (2, 32, 32, 3)
        assert batch["P1"].shape == (2, 32, 32, 21)
        assert batch["D1"].shape == (2, 32, 32, 3)
        h1 = np.asarray(batch["H1"])
        assert h1.min() >= -1.0 - 1e-5 and h1.max() <= 1.0 + 1e-5
        p2 = np.asarray(batch["P2"])
        assert p2.max() == pytest.approx(1.0, abs=1e-3)  # peak at keypoint
        # depth planes replicate
        d1 = np.asarray(batch["D1"])
        np.testing.assert_allclose(d1[..., 0], d1[..., 2])

    def test_cache_mode(self):
        cfg = _cfg("", "synthetic", size=32, bsz=2)
        ds = SyntheticHands(cfg, length=4)
        loader = HostLoader(ds, 2, seed=1, cache=True)
        b1 = list(loader.epoch(0))
        assert len(loader._cache) == 4
        calls = {"n": 0}
        orig = ds.load_pair
        ds.load_pair = lambda i: (calls.__setitem__("n", calls["n"] + 1),
                                  orig(i))[1]
        b2 = list(loader.epoch(1))
        assert calls["n"] == 0  # second epoch fully served from cache
        np.testing.assert_array_equal(
            sorted(np.concatenate([b["src_uv"] for b in b1], 0).ravel()),
            sorted(np.concatenate([b["src_uv"] for b in b2], 0).ravel()))


def _write_fake_mmhand(root, n=10, size=32):
    """Fake MMHand CSV tree (reference data/mmhand_dataset.py:14-118):
    imageroot/train/color_*.png (+depth_* siblings), poseroot/trainP/*.npy,
    and a (from,to) pair CSV."""
    img_dir = os.path.join(root, "images", "train")
    pose_dir = os.path.join(root, "poses", "trainP")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pose_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"color_{i:04d}"
        img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, name + ".png"))
        Image.fromarray(img[::-1]).save(
            os.path.join(img_dir, name.replace("color", "depth") + ".png"))
        np.save(os.path.join(pose_dir, name + ".npy"),
                rng.uniform(0, 1, (size, size, 21)).astype(np.float32))
        names.append(name)
    csv = os.path.join(root, "pairs.csv")
    with open(csv, "w") as fh:
        fh.write("from,to\n")
        for i in range(n):
            fh.write(f"{names[i]},{names[(i + 1) % n]}\n")
    return os.path.join(root, "images"), os.path.join(root, "poses"), csv


@pytest.mark.slow
class TestMMHandWiring:
    """--dataset MMHand end-to-end (VERDICT r1 item 3; reference
    data/mmhand_dataset_data_loader.py:12-17 + data/mmhand_dataset.py)."""

    def _cfg(self, tmp_path, size=32, bsz=2):
        imageroot, poseroot, csv = _write_fake_mmhand(str(tmp_path), size=size)
        return Config(
            model=ModelConfig(fine_size=size),
            data=DataConfig(dataset="MMHand", batch_size=bsz,
                            image_root=imageroot, pose_root=poseroot,
                            pair_lst=csv, use_flip=True))

    def test_factory_dispatch(self, tmp_path):
        ds = build_dataset(self._cfg(tmp_path))
        assert getattr(ds, "prerendered", False)
        assert len(ds) == 10

    def test_requires_pairlst(self):
        cfg = Config(data=DataConfig(dataset="MMHand"))
        with pytest.raises(ValueError, match="pairLst"):
            build_dataset(cfg)

    def test_loader_and_prepare_passthrough(self, tmp_path):
        cfg = self._cfg(tmp_path)
        ds = build_dataset(cfg)
        loader = HostLoader(ds, 2, seed=1)
        raw = next(iter(loader.epoch(0)))
        assert raw["H1"].shape == (2, 32, 32, 3)
        assert raw["P1"].shape == (2, 32, 32, 21)
        assert raw["D2"].shape == (2, 32, 32, 3)
        assert len(raw["src_paths"]) == 2
        prep = make_prepare_batch()
        batch = prep({k: v for k, v in raw.items() if not k.endswith("paths")})
        np.testing.assert_allclose(np.asarray(batch["H1"]), raw["H1"])
        assert np.asarray(batch["H1"]).min() >= -1.0 - 1e-5

    def test_cli_flags(self, tmp_path):
        import argparse
        from mmhand_tpu.config import add_cli_args, from_cli_args
        imageroot, poseroot, csv = _write_fake_mmhand(str(tmp_path))
        p = argparse.ArgumentParser()
        add_cli_args(p)
        args = p.parse_args(["--dataset", "MMHand", "--pairLst", csv,
                             "--imageroot", imageroot, "--poseroot", poseroot,
                             "--use_flip"])
        cfg = from_cli_args(args)
        assert cfg.data.use_flip and cfg.data.image_root == imageroot
        ds = build_dataset(cfg)
        assert len(ds) == 10

    @pytest.mark.slow
    def test_train_smoke(self, tmp_path):
        from dataclasses import replace
        from mmhand_tpu.train.loop import train
        cfg = self._cfg(tmp_path, bsz=8)
        cfg = Config(
            model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8, ndf=8),
            optim=OptimConfig(pool_size=2),
            data=replace(cfg.data, batch_size=8),
            run=RunConfig(name="mmtest",
                          checkpoints_dir=str(tmp_path / "ckpt"),
                          print_freq=100, display_freq=1000,
                          save_latest_freq=1000))
        result = train(cfg, max_steps=1)
        assert result.steps == 1
        assert np.isfinite(list(result.last_metrics.values())).all()


class TestParallelLoader:
    """N-worker batch assembly (VERDICT r1 item 10)."""

    def test_multithreaded_matches_single(self):
        cfg = _cfg("", "synthetic", size=32, bsz=2)
        ds = SyntheticHands(cfg, length=12)
        b1 = list(HostLoader(ds, 2, seed=1, num_threads=1).epoch(0))
        b4 = list(HostLoader(ds, 2, seed=1, num_threads=4).epoch(0))
        assert len(b1) == len(b4) == 6
        for a, b in zip(b1, b4):
            np.testing.assert_array_equal(a["src_image"], b["src_image"])
            assert a["src_paths"] == b["src_paths"]

    def test_throughput_scales_with_workers(self):
        import time as _t

        class SlowDS:
            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

            def load_pair(self, i):
                _t.sleep(0.01)
                from mmhand_tpu.data.datasets import RawItem
                item = RawItem(image=np.zeros((8, 8, 3), np.uint8),
                               depth=np.zeros((8, 8), np.uint16),
                               uv=np.zeros((21, 2), np.float32),
                               z=np.zeros((21,), np.float32), path=str(i))
                return item, item

        ds = SlowDS(32)
        t0 = _t.perf_counter()
        list(HostLoader(ds, 2, seed=1, num_threads=1, prefetch=0).epoch(0))
        t1 = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        list(HostLoader(ds, 2, seed=1, num_threads=8, prefetch=0).epoch(0))
        t8 = _t.perf_counter() - t0
        assert t8 < t1 * 0.5  # >=2x from 8 workers on sleep-bound decode
