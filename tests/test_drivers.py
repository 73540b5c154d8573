"""End-to-end driver tests: video mode, offline evaluation, batched dir."""
import os

import numpy as np
import pytest
from PIL import Image

from tpu_unet.infer.wrapper import Unet


@pytest.fixture(scope="module")
def wrapper():
    return Unet(model="ultralight", num_classes=4, input_shape=[32, 32],
                model_path="")


def test_video_mode(tmp_path, wrapper):
    cv2 = pytest.importorskip("cv2")
    from tpu_unet.tools.predict import predict_video

    src = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 5, (48, 32))
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write(rng.randint(0, 255, (32, 48, 3)).astype("uint8"))
    w.release()

    dst = str(tmp_path / "out.avi")
    frames, fps = predict_video(wrapper, src, dst, video_fps=5,
                                max_frames=3)
    assert frames == 3
    assert os.path.getsize(dst) > 0


def test_video_batched(tmp_path, wrapper):
    cv2 = pytest.importorskip("cv2")
    from tpu_unet.tools.predict import predict_video_batched

    src = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 5, (48, 32))
    rng = np.random.RandomState(1)
    for _ in range(10):
        w.write(rng.randint(0, 255, (32, 48, 3)).astype("uint8"))
    w.release()
    dst = str(tmp_path / "out.avi")
    frames = predict_video_batched(wrapper, src, dst, batch_size=4,
                                   video_fps=5)
    assert frames == 10
    check = cv2.VideoCapture(dst)
    n = 0
    while check.read()[0]:
        n += 1
    assert n == 10


def test_evaluate_driver(tmp_path, wrapper):
    from tpu_unet.eval.driver import evaluate, show_results

    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    img_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.RandomState(1)
    ids = []
    for i in range(3):
        name = f"s{i}"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3)).astype("uint8")
                        ).save(img_dir / f"{name}.jpg")
        Image.fromarray(rng.randint(0, 4, (40, 40)).astype("uint8")
                        ).save(gt_dir / f"{name}.png")
        ids.append(name)
    res = evaluate(wrapper, ids, str(gt_dir), 4,
                   name_classes=["bg", "a", "b", "c"],
                   image_dir=str(img_dir), pred_dir=str(tmp_path / "preds"),
                   verbose=False)
    assert 0.0 <= res["miou"] <= 1.0
    assert len(os.listdir(tmp_path / "preds")) == 3
    show_results(res, str(tmp_path / "plots"), ["bg", "a", "b", "c"])


def test_evaluate_npy_roundtrip(tmp_path):
    from tpu_unet.eval.driver import evaluate_npy

    rng = np.random.RandomState(2)
    for i in range(2):
        gt = rng.randint(0, 4, (16, 16))
        np.save(tmp_path / f"prediction_{i:06d}.npy", gt)  # perfect preds
        np.save(tmp_path / f"ground_truth_{i:06d}.npy", gt)
    res = evaluate_npy(str(tmp_path), str(tmp_path), 4, verbose=False)
    assert res["miou"] == pytest.approx(1.0)
