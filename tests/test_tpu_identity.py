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
    accumulate in different orders, and with randomly-initialised weights
    the 21 logits cluster tightly, so near-tie pixels legitimately flip
    (measured ~0.5% on this chip).  A real defect (layout/indexing bug)
    flips CONFIDENT pixels — so the assertion is margin-aware: every
    disagreeing pixel must be a near-tie in the f32 master-weight
    probability map, and the overall rate must stay small."""
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
    disagree = fast != plain
    mismatch = float(disagree.mean())
    assert mismatch < 2e-2, f"mask mismatch rate {mismatch:.4%}"
    if mismatch:
        # f32 probabilities from the master weights (the wrapper's
        # reference-semantics forward), image by image to bound D2H
        bad_margin = 0
        for i in range(imgs.shape[0]):
            if not disagree[i].any():
                continue
            pr = np.asarray(u._forward_probs(u.variables, imgs[i:i + 1])[0])
            yy, xx = np.nonzero(disagree[i])
            p_plain = pr[yy, xx, plain[i, yy, xx]]
            p_fast = pr[yy, xx, fast[i, yy, xx]]
            # a genuine flip needs the two classes' probabilities to be
            # essentially tied; bf16 rounding moves probs by O(1e-3)
            bad_margin += int((np.abs(p_plain - p_fast) > 2e-2).sum())
        frac_bad = bad_margin / max(int(disagree.sum()), 1)
        assert frac_bad < 1e-2, (
            f"{bad_margin} disagreeing pixels ({frac_bad:.2%} of "
            f"disagreements) have a non-tie probability margin — "
            f"that is a real numerical defect, not bf16 tie-breaking")


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
