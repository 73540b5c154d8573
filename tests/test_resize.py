"""Resize-semantics golden tests vs torch / cv2 (SURVEY.md §7 hard parts)."""
import numpy as np
import pytest

from tpu_unet.nn.resize import resize_bilinear, resize_nearest, upsample2x

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((7, 5), (14, 10)), ((16, 16), (8, 8)),
    ((9, 13), (33, 17)), ((4, 4), (4, 4)), ((5, 5), (1, 1)),
])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.rand(2, *in_hw, 3).astype("float32")
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=True))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=out_hw, mode="bilinear", align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((16, 16), (7, 9)), ((5, 7), (10, 14)),
])
def test_bilinear_half_pixel_matches_torch(in_hw, out_hw):
    """align_corners=False == torch's align_corners=False == cv2 INTER_LINEAR."""
    rng = np.random.RandomState(1)
    x = rng.rand(1, *in_hw, 4).astype("float32")
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=False))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=out_hw, mode="bilinear", align_corners=False)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_half_pixel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(2)
    x = rng.rand(16, 12, 3).astype("float32")
    ours = np.asarray(resize_bilinear(x, (37, 29), align_corners=False))
    ref = cv2.resize(x, (29, 37), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((8, 8), (5, 3)), ((3, 5), (9, 10)),
])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(3)
    x = rng.rand(1, *in_hw, 2).astype("float32")
    ours = np.asarray(resize_nearest(x, out_hw))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=out_hw, mode="nearest")
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


def test_upsample2x_matches_torch_upsampling_bilinear2d():
    rng = np.random.RandomState(4)
    x = rng.rand(1, 6, 6, 8).astype("float32")
    ours = np.asarray(upsample2x(x))
    up = torch.nn.UpsamplingBilinear2d(scale_factor=2)
    ref = up(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
