"""End-to-end integration: GAN train -> checkpoint -> aug generation ->
HPE mixing dataset consumes the fakes.  Tiny sizes, CPU."""

import os
import pickle

import jax
import numpy as np
import pytest
from PIL import Image

from mmhand_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, RunConfig


def _write_crop_tree(root, n=4, size=32):
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


@pytest.mark.slow
def test_full_pipeline_train_generate_mix(tmp_path):
    import sys
    sys.path.insert(0, "scripts")
    from aug import generate
    from mmhand_tpu.hpe.data import HPEMixDataset, augmentation_dir_for
    from mmhand_tpu.train.loop import train

    data_root = str(tmp_path / "d" / "rhd_crop")
    # conftest gives 8 CPU devices -> train() goes data-parallel with a
    # host batch of >=8; size the dataset so one step exists per epoch
    _write_crop_tree(data_root, n=20)
    cfg = Config(
        model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8, ndf=8),
        optim=OptimConfig(pool_size=2),
        data=DataConfig(dataset="RHD", dataroot=data_root, batch_size=8,
                        augmentation_ratio=0.5),
        run=RunConfig(name="itest", checkpoints_dir=str(tmp_path / "ckpt"),
                      print_freq=100, display_freq=1000,
                      save_latest_freq=1000))

    # 1. train the GAN for 1 step on the ratio-0.5 train split and save
    result = train(cfg, max_steps=1)
    assert result.steps == 1

    # 2. generate the complement split into the {method}_{leaf} sibling
    aug_dir = augmentation_dir_for(data_root, "MM-Hand")
    written = generate(cfg.replace(is_train=False), aug_dir, batch_size=2)
    assert written >= 1
    fakes = os.listdir(os.path.join(aug_dir, "color"))
    assert all(f.endswith(".png") for f in fakes)

    # 3. the HPE mixing dataset picks up the generated images
    hpe_cfg = cfg.replace(is_train=True).replace(
        data=DataConfig(dataset="RHD", dataroot=data_root, batch_size=2,
                        augmentation_ratio=0.0,
                        augmentation_method="MM-Hand", seed=49))
    ds = HPEMixDataset(hpe_cfg)
    assert ds.augmentation_map.all()  # ratio 0 -> all augmented
    # items whose fake exists load it; verify at least the generated ones do
    loaded = 0
    for i in range(len(ds)):
        name = os.path.basename(ds.paths[i])
        if name in fakes:
            item = ds.load_item(i)
            assert item["image"].shape == (32, 32, 3)
            assert item["weight"] == 1
            loaded += 1
    assert loaded == len(fakes)
