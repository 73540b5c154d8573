"""Dataset layout validation — the RUNBOOK_VOC.md pre-flight
(`cli train --dry-run`)."""
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from tpu_unet.data.datasets import VOCSegDataset, validate_layout


def _make_voc_tree(root, n=6, num_classes=4, label_values=None):
    img_dir = os.path.join(root, "VOC2012", "JPEGImages")
    lbl_dir = os.path.join(root, "VOC2012", "SegmentationClass")
    sets = os.path.join(root, "VOC2012", "ImageSets", "Segmentation")
    os.makedirs(img_dir), os.makedirs(lbl_dir), os.makedirs(sets)
    rng = np.random.RandomState(0)
    ids = [f"im{i:03d}" for i in range(n)]
    for name in ids:
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(os.path.join(img_dir, name + ".jpg"))
        vals = label_values or list(range(num_classes))
        lbl = rng.choice(vals, (32, 32)).astype(np.uint8)
        Image.fromarray(lbl).save(os.path.join(lbl_dir, name + ".png"))
    with open(os.path.join(sets, "train.txt"), "w") as f:
        f.write("\n".join(ids[: n - 2]))
    with open(os.path.join(sets, "val.txt"), "w") as f:
        f.write("\n".join(ids[n - 2:]))
    return ids


def test_validate_ok(tmp_path):
    root = str(tmp_path)
    ids = _make_voc_tree(root)
    report = validate_layout(VOCSegDataset, root, ids[:4], ids[4:], 4)
    assert report["train_ids"] == 4 and report["probed"] > 0
    assert set(report["classes_seen"]) <= {0, 1, 2, 3}
    assert not report["warnings"]


def test_validate_missing_dir(tmp_path):
    with pytest.raises(ValueError, match="missing directory"):
        validate_layout(VOCSegDataset, str(tmp_path), ["a"], [], 4)


def test_validate_missing_label(tmp_path):
    root = str(tmp_path)
    ids = _make_voc_tree(root)
    os.remove(os.path.join(root, "VOC2012", "SegmentationClass",
                           ids[0] + ".png"))
    with pytest.raises(ValueError, match="missing"):
        validate_layout(VOCSegDataset, root, ids, [], 4)


def test_validate_binary_mask_warning(tmp_path):
    root = str(tmp_path)
    ids = _make_voc_tree(root, label_values=[0, 255])
    report = validate_layout(VOCSegDataset, root, ids, [], 2)
    assert any("binary" in w for w in report["warnings"])


def test_cli_dry_run(tmp_path):
    root = str(tmp_path)
    _make_voc_tree(root, num_classes=21)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, "-m", "tpu_unet.cli", "train", "--preset", "voc",
         "--data-root", root, "--data-path", root, "--no-pretrained",
         "--dry-run"],
        capture_output=True, text=True, env=env, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dry-run OK" in out.stdout
