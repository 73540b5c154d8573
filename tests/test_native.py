"""Native C++ loader tests — byte parity with the PIL path."""
import os

import numpy as np
import pytest
from PIL import Image

from tpu_unet.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")

IMG = "/root/reference/img/In_1.jpg"


def _rand_img(tmp_path, name="x.png", size=(37, 53)):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, size=(size[1], size[0], 3)).astype("uint8")
    p = str(tmp_path / name)
    Image.fromarray(arr).save(p)
    return p, arr


@pytest.mark.parametrize("out", [(256, 256), (100, 64), (512, 384)])
def test_bicubic_matches_pil(tmp_path, out):
    p, arr = _rand_img(tmp_path)
    ours = native.resize_bicubic(arr, out[0], out[1])
    ref = np.asarray(Image.fromarray(arr).resize((out[1], out[0]),
                                                 Image.BICUBIC))
    np.testing.assert_array_equal(ours, ref)


def test_letterbox_batch_matches_pil(tmp_path):
    from tpu_unet.infer.wrapper import _letterbox_image

    paths = []
    arrays = []
    for i, size in enumerate([(40, 30), (31, 77)]):
        p, arr = _rand_img(tmp_path, f"img{i}.png", size)
        paths.append(p)
        arrays.append(arr)
    if os.path.exists(IMG):
        paths.append(IMG)
        arrays.append(np.asarray(Image.open(IMG).convert("RGB")))
    batch, nws, nhs = native.load_letterbox_batch(paths, 128, 128)
    for i, arr in enumerate(arrays):
        boxed, nw, nh = _letterbox_image(Image.fromarray(arr), (128, 128))
        np.testing.assert_array_equal(batch[i], np.asarray(boxed))
        assert (nws[i], nhs[i]) == (nw, nh)


def test_decode_failure_reported(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8not a real jpeg")
    with pytest.raises(RuntimeError, match="failed to decode"):
        native.load_letterbox_batch([str(bad)], 64, 64)
