"""Data transform tests: determinism, shapes, label integrity."""
import numpy as np
import pytest
from PIL import Image

from tpu_unet.data import transforms as T


def _pair(w=40, h=30, seed=0):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3)).astype("uint8"))
    lbl = Image.fromarray(rng.randint(0, 4, (h, w)).astype("uint8"))
    return img, lbl


def test_letterbox_pair_geometry():
    img, lbl = _pair(40, 30)
    im, lb = T.letterbox_pair(img, lbl, (64, 64))
    assert im.size == (64, 64) and lb.size == (64, 64)
    arr = np.asarray(im)
    # gray bars top/bottom (40x30 → 64x48 content, centered)
    assert (arr[0] == 128).all() and (arr[-1] == 128).all()
    # pasted label never invents classes
    assert set(np.unique(np.asarray(lb))) <= {0, 1, 2, 3}


def test_random_voc_aug_deterministic_per_seed():
    img, lbl = _pair()
    a1, l1 = T.random_voc_aug(img, lbl, (32, 32), np.random.RandomState(7))
    a2, l2 = T.random_voc_aug(img, lbl, (32, 32), np.random.RandomState(7))
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(l1, l2)
    a3, _ = T.random_voc_aug(img, lbl, (32, 32), np.random.RandomState(8))
    assert not np.array_equal(a1, a3)
    assert a1.shape == (32, 32, 3) and l1.shape == (32, 32)


def test_heavy_aug_shapes_and_label_values():
    pytest.importorskip("cv2")
    img, lbl = _pair(64, 64)
    ia = np.asarray(img)
    la = np.asarray(lbl)
    for seed in range(6):  # cover several transform branches
        rng = np.random.RandomState(seed)
        out_i, out_l = T.heavy_aug(ia.copy(), la.copy(), rng)
        assert out_i.shape == ia.shape and out_l.shape == la.shape
        assert out_i.dtype == np.uint8
        assert set(np.unique(out_l)) <= {0, 1, 2, 3}


def test_medical_label_binarize(tmp_path):
    from tpu_unet.data.datasets import MedicalSegDataset

    (tmp_path / "Images").mkdir()
    (tmp_path / "Labels").mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (20, 20, 3)).astype("uint8")).save(
        tmp_path / "Images" / "0.png")
    lbl = np.zeros((20, 20), np.uint8)
    lbl[:10] = 255  # white → background(0); dark → class 1
    Image.fromarray(lbl).save(tmp_path / "Labels" / "0.png")
    ds = MedicalSegDataset(["0"], (20, 20), 2, train=False,
                           dataset_path=str(tmp_path))
    img, enc = ds[0]
    assert (enc[:10] == 0).all() and (enc[10:] == 1).all()


def test_voc_label_ignore_encoding(tmp_path):
    from tpu_unet.data.datasets import VOCSegDataset

    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 255, (16, 16, 3)).astype("uint8")).save(
        root / "JPEGImages" / "a.jpg")
    lbl = np.zeros((16, 16), np.uint8)
    lbl[0, 0] = 255  # VOC white border → ignore (= num_classes)
    lbl[1, 1] = 3
    Image.fromarray(lbl).save(root / "SegmentationClass" / "a.png")
    ds = VOCSegDataset(["a"], (16, 16), 4, train=False,
                       dataset_path=str(tmp_path))
    _, enc = ds[0]
    assert enc[0, 0] == 4 and enc[1, 1] == 3  # png[png>=nc]=nc
