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
