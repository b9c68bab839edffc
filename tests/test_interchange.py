"""Tree-level real-format interchange (VERDICT r3 item 5).

Builds a miniature RHD-source archive in the reference's on-disk schema —
``<src>/evaluation/anno_evaluation.pickle`` mapping frame index to
{'K', 'xyz', 'uv_vis'} plus ``<src>/evaluation/{color,depth,mask}/NNNNN.png``
(reference tool/create_RHD_DB.py:306-330) — then drives the actual script
CLIs over it as one chain:

    scripts/create_rhd_db.py -> scripts/train.py --max_steps 2
        -> scripts/aug.py -> scripts/evaluate_gan.py

asserting the produced pickle/PNG tree round-trips through every consumer
with no path or key fixups.  The archive includes the reference's edge
cases: a two-hand frame (42 keypoints -> _l/_r split + right-hand flip,
reference :217-231), an invisible-keypoint frame (rejected, :238-239),
and an empty-mask frame (false-positive filter, :336-343).
"""

import json
import os
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

N_VALID = 20          # single-hand frames that survive
FRAME_2HAND = N_VALID          # -> two crops (_l, _r)
FRAME_INVIS = N_VALID + 1      # rejected: an invisible keypoint
FRAME_NOMASK = N_VALID + 2     # crops fine but mask max==0 -> filtered
N_CROPS = N_VALID + 2          # final tree size


def _hand_uv(rng, lo=110.0, hi=210.0):
    """21 visible keypoints well inside the 320x320 frame (the +-20 bbox
    margin then stays in-bounds)."""
    uv = rng.uniform(lo, hi, (21, 2))
    return np.concatenate([uv, np.ones((21, 1))], axis=1)


def _write_rhd_source(src: Path) -> None:
    split = src / "evaluation"
    for kind in ("color", "depth", "mask"):
        (split / kind).mkdir(parents=True)
    rng = np.random.RandomState(7)
    k_cam = np.array([[283.1, 0.0, 160.0],
                      [0.0, 283.1, 160.0],
                      [0.0, 0.0, 1.0]])
    anno = {}
    n_frames = N_VALID + 3
    for i in range(n_frames):
        if i == FRAME_2HAND:
            uv_vis = np.concatenate([_hand_uv(rng), _hand_uv(rng)])
            xyz = rng.uniform(-0.1, 0.6, (42, 3))
        else:
            uv_vis = _hand_uv(rng)
            xyz = rng.uniform(-0.1, 0.6, (21, 3))
            if i == FRAME_INVIS:
                uv_vis[3, 2] = 0.0
        anno[i] = {"K": k_cam, "xyz": xyz, "uv_vis": uv_vis}

        name = f"{i:05d}.png"
        color = rng.randint(0, 255, (320, 320, 3), dtype=np.uint8)
        depth = rng.randint(0, 255, (320, 320, 3), dtype=np.uint8)
        mask = np.zeros((320, 320), np.uint8)
        if i != FRAME_NOMASK:
            mask[100:220, 100:220] = 5  # RHD part labels are >=2 on hands
        Image.fromarray(color).save(split / "color" / name)
        Image.fromarray(depth).save(split / "depth" / name)
        Image.fromarray(mask).save(split / "mask" / name)
    with open(split / "anno_evaluation.pickle", "wb") as f:
        pickle.dump(anno, f)


@pytest.mark.slow
def test_rhd_source_to_metrics_interchange(tmp_path, capsys):
    import aug as aug_cli
    import create_rhd_db as create_cli
    import evaluate_gan as eval_cli
    import train as train_cli

    src = tmp_path / "RHD_published_v2"
    crops = tmp_path / "rhd_crop"
    ckpt = tmp_path / "ckpt"
    _write_rhd_source(src)

    # ---- 1. scripts/create_rhd_db.py (reference tool/create_RHD_DB.py)
    create_cli.main([str(src), str(crops), "32", "--workers", "2"])

    with open(crops / "annotation.pickle", "rb") as f:
        tree_anno = pickle.load(f)
    assert set(tree_anno) == {"color", "depth", "mask"}
    names = sorted(tree_anno["color"])
    assert len(names) == N_CROPS
    assert names == [f"{i:05d}.png" for i in range(N_CROPS)]
    for kind in ("color", "depth", "mask"):
        assert sorted(os.listdir(crops / kind)) == names
    one = tree_anno["color"][names[0]]
    assert set(one) == {"K", "uv_coord", "xyz", "depth"}
    assert one["uv_coord"].shape == (21, 2)
    assert (one["uv_coord"] >= 0).all() and (one["uv_coord"] <= 32).all()
    assert np.asarray(Image.open(crops / "color" / names[0])).shape == \
        (32, 32, 3)

    # ---- 2. scripts/train.py over the produced tree (reference flag names)
    common = ["--dataset", "RHD", "--dataroot", str(crops),
              "--fineSize", "32", "--ngf", "4", "--ndf", "4",
              "--name", "ix", "--checkpoints_dir", str(ckpt),
              "--augmentation_ratio", "0.5", "--seed", "11"]
    train_cli.main(common + ["--batchSize", "8", "--max_steps", "2",
                             "--print_freq", "1000",
                             "--display_freq", "1000",
                             "--save_latest_freq", "1000"])
    assert (ckpt / "ix").is_dir()

    # ---- 3. scripts/aug.py: generate the complement split from the saved
    # checkpoint into the reference's DST/<folder>/<name> tree
    aug_dir = tmp_path / "MM-Hand_rhd_crop"
    aug_cli.main(common + ["--dst", str(aug_dir), "--gen_batch", "4"])
    fakes = sorted(os.listdir(aug_dir / "color"))
    assert fakes and set(fakes) <= set(names)
    fake = np.asarray(Image.open(aug_dir / "color" / fakes[0]))
    assert fake.shape == (32, 32, 3) and fake.dtype == np.uint8

    # ---- 4. scripts/evaluate_gan.py over the same tree + checkpoint
    eval_cli.main(common + ["--eval_batch", "4", "--max_dataset_size", "4",
                            "--no_pck"])
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.startswith("{")]
    scores = json.loads(out_lines[-1])
    for key in ("IS_avg", "IS_std", "SSIM_avg", "SSIM_std", "fid"):
        assert key in scores, scores
        assert np.isfinite(scores[key]), scores
    assert 0.0 <= scores["SSIM_avg"] <= 1.0
