"""TPU-gated production-shape tests — run on the REAL chip:

    TPU_UNET_TPU_TESTS=1 python -m pytest tests/test_tpu_identity.py -q

Motivation (VERDICT r4 #4, STATUS.md round-4 highlights): CPU interpret
mode does not catch Mosaic layout errors — resnet50's TPU *training*
path had never compiled until round 4 smoked it on hardware.  These
tests pin (a) fast-vs-plain serving mask identity at the committed
benchmark configuration (512×512, batch 8, bf16, Mosaic — not
interpret), and (b) a train-step compile-smoke for EVERY registry model
at its production input shape, so any new Mosaic-invalid layout is
caught by `pytest` instead of a customer.

In the normal CPU suite these self-skip (backend is cpu).
"""
import jax
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs the real chip (TPU_UNET_TPU_TESTS=1)")


@requires_tpu
@pytest.mark.parametrize("model", ["unet_vgg", "unet_resnet50"])
def test_fast_vs_plain_mask_identity_512px_b8(model):
    """The fused fast serving path vs the plain XLA forward at the exact
    committed-benchmark shape.  Both run bf16 on-chip; Pallas and XLA
    accumulate in different orders, so a handful of near-tie pixels may
    legitimately flip — the bound (0.1%) is far below any real defect
    (a layout/indexing bug shifts whole tiles, 10-100% mismatch)."""
    from tpu_unet.core import fusion
    from tpu_unet.infer.wrapper import Unet

    imgs = np.random.RandomState(0).randint(
        0, 255, size=(8, 512, 512, 3)).astype(np.uint8)
    try:
        fusion.set_fused_decoder(False)
        u = Unet(model=model, num_classes=21, input_shape=[512, 512],
                 model_path="")
        plain = u.batch_infer(imgs)

        fusion.set_fused_decoder(True)
        u.generate()  # same weights: empty model_path re-inits identically
        fast = u.batch_infer(imgs)
    finally:
        fusion.set_fused_decoder(None)

    assert fast.shape == plain.shape == (8, 512, 512)
    mismatch = float((fast != plain).mean())
    assert mismatch < 1e-3, f"mask mismatch rate {mismatch:.4%}"


# production input sizes: the canonical 512px recipes (train.py:40) and
# the 256px competition recipes (Submit/train.py, *_Train.py clones)
_SHAPES = {"unet_vgg": 512, "unet_resnet50": 512}


@requires_tpu
def test_every_registry_train_step_compiles_on_chip():
    """One real train step per registry model at its production shape.
    This is the regression net for the round-4 class of bug: a Mosaic
    layout that only an on-chip compile can reject."""
    from tpu_unet.models.registry import MODELS, build_model, init_model
    from tpu_unet.train.step import (StepConfig, create_train_state,
                                     make_optimizer, make_train_step)

    rng = np.random.RandomState(0)
    failures = []
    for name in sorted(MODELS):
        hw = _SHAPES.get(name, 256)
        try:
            model = build_model(name, 21)
            variables = init_model(model, (hw, hw), train=True)
            cfg = StepConfig(num_classes=21, cls_weights=(1.0,) * 21,
                             use_dice=True, compute_dtype=jax.numpy.bfloat16)
            tx = make_optimizer("adam")
            state = create_train_state(model, variables, tx)
            step = make_train_step(model, cfg)
            batch = {
                "image": rng.randint(0, 255, (2, hw, hw, 3)).astype(np.uint8),
                "label": rng.randint(0, 21, (2, hw, hw)).astype(np.int32),
            }
            state, metrics = step(state, batch, 1e-4, jax.random.PRNGKey(0))
            loss = float(metrics["loss"])
            assert np.isfinite(loss), f"{name}: non-finite loss {loss}"
        except Exception as e:  # collect all failures, then report
            failures.append(f"{name}@{hw}px: {type(e).__name__}: {e}")
        finally:
            # free the chip between models — 512px train states are large
            for buf in list(jax.live_arrays()):
                buf.delete()
    assert not failures, "train-step compile failures on chip:\n" + \
        "\n".join(failures)
