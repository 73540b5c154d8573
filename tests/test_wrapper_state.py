"""Wrapper/loader state-hygiene tests."""
import numpy as np
import pytest


def test_wrapper_does_not_mutate_class_defaults():
    from tpu_unet.infer.wrapper import Unet

    before = dict(Unet._defaults)
    Unet(model="ultralight", num_classes=4, input_shape=[32, 32],
         model_path="")
    assert Unet._defaults == before


def test_loader_batch_divisibility_error():
    from tpu_unet.data.loader import Loader

    with pytest.raises(ValueError, match="divisible by the"):
        Loader(dataset=[], batch_size=5, process_count=2)


def test_pack_submission(tmp_path):
    from tpu_unet.tools.results_export import pack_submission

    src = tmp_path / "artifacts"
    src.mkdir()
    (src / "metrics.txt").write_text("{}")
    out = pack_submission(str(src), str(tmp_path / "sub.zip"))
    import zipfile

    with zipfile.ZipFile(out) as z:
        assert "metrics.txt" in z.namelist()
