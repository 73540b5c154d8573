"""CLI subprocess smoke tests — the real command surface."""
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ENV = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")


def _run(*args, timeout=240):
    return subprocess.run([sys.executable, "-m", "tpu_unet.cli", *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=ENV, cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))


def test_no_subcommand_usage():
    r = _run()
    assert r.returncode != 0
    assert "usage: tpu_unet" in r.stderr


def test_summary_subcommand():
    r = _run("summary", "--model", "traditional", "--size", "32",
             "--num-classes", "4")
    assert r.returncode == 0, r.stderr[-500:]
    assert "1,949,796" in r.stdout


def test_predict_single(tmp_path):
    src = tmp_path / "x.jpg"
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (40, 40, 3)).astype("uint8")).save(src)
    out = tmp_path / "seg.jpg"
    r = _run("predict", "--preset", "ultralight", "--mode", "single",
             "--input", str(src), "--output", str(out),
             "--input-shape", "32", "32")
    assert r.returncode == 0, r.stderr[-500:]
    assert out.exists()


def test_bad_preset_message():
    r = _run("predict", "--preset", "nope", "--mode", "single",
             "--input", "x.jpg")
    assert r.returncode != 0
    assert "unknown inference preset" in (r.stderr + r.stdout)


def test_train_medical_with_eval_callback(tmp_path):
    """VERDICT r1 #6 acceptance: a medical `cli train` run leaves
    epoch_miou.txt + IoU-curve PNGs in the log dir."""
    split = "/root/reference/Medical_Datasets/ImageSets/Segmentation/train.txt"
    if not os.path.exists(split):
        pytest.skip("reference medical data not mounted")
    short = tmp_path / "short.txt"
    short.write_text("".join(open(split).readlines()[:8]))
    save = tmp_path / "logs"
    r = _run("train", "--preset", "medical", "--data-root", "/root/reference",
             "--data-path", "/root/reference/Medical_Datasets",
             "--train-split", str(short), "--val-split", str(short),
             "--epochs", "1", "--batch-size", "8", "--input-shape", "64", "64",
             "--eval-period", "1", "--no-pretrained",
             "--save-dir", str(save), timeout=600)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    logdirs = [d for d in os.listdir(save) if d.startswith("loss_")]
    assert logdirs, os.listdir(save)
    logdir = save / logdirs[0]
    assert (logdir / "epoch_miou.txt").exists()
    assert (logdir / "epoch_miou.png").exists()
    assert (logdir / "epoch_class_iou.png").exists()
    assert (save / "last_epoch_weights.msgpack").exists()


def test_fold_repvgg_cli(tmp_path):
    """`cli fold` = switch_to_deploy (reference: RepVGG_Unet.py:203-207)."""
    env2 = dict(ENV, XLA_FLAGS="")
    code = (
        "from tpu_unet.models.registry import build_model, init_model\n"
        "from tpu_unet.train.checkpoint import save_variables\n"
        "m = build_model('repvgg_segnet', 4)\n"
        "v = init_model(m, (32, 32), train=True)\n"
        f"save_variables(r'{tmp_path / 'train.msgpack'}', v)\n")
    r = subprocess.run([sys.executable, "-c", code], env=env2,
                       capture_output=True, text=True, timeout=240,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-1000:]
    out = tmp_path / "deploy.msgpack"
    r = _run("fold", "--model", "repvgg_segnet",
             "--model-path", str(tmp_path / "train.msgpack"),
             "--out", str(out))
    assert r.returncode == 0, (r.stdout + r.stderr)[-1000:]
    assert out.exists()
    # the folded tree loads into the deploy-mode model and agrees with the
    # training-mode model in eval
    check = (
        "import numpy as np\n"
        "from tpu_unet.models.registry import build_model\n"
        "from tpu_unet.train.checkpoint import load_variables\n"
        "train_v = load_variables(r'%s')\n"
        "deploy_v = load_variables(r'%s')\n"
        "x = np.random.RandomState(0).rand(1, 32, 32, 3).astype('float32')\n"
        "a = build_model('repvgg_segnet', 4).apply(train_v, x, False)\n"
        "b = build_model('repvgg_segnet', 4, deploy=True).apply(deploy_v, x, False)\n"
        "np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)\n"
        "print('fold parity OK')\n" % (tmp_path / "train.msgpack", out))
    r = subprocess.run([sys.executable, "-c", check], env=env2,
                       capture_output=True, text=True, timeout=240,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, (r.stdout + r.stderr)[-1000:]
    assert "fold parity OK" in r.stdout
