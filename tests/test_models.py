"""Model zoo shape/param golden tests (SURVEY.md §4: the reference's
__main__ smoke blocks, done properly)."""
import numpy as np
import pytest

from tpu_unet.models.registry import MODELS, build_model, count_params, init_model

# param counts at num_classes=4, verified against torch construction of the
# reference nets (see test_parity.py for live comparison).  The published
# competition numbers confirm two of them: ultralight_large_optimized
# 926,347 (Submit_result/关键指标数据文档.txt) and traditional 1,949,796
# (= torch's count; the published 1,950,357 includes extras not in the
# shipped class).
PARAM_COUNTS = {
    "unet_vgg": 24_891_332,
    "unet_resnet50": 43_932_996,
    "self_net": 24_965_188,
    "traditional": 1_949_796,
    "traditional22": 922_706,
    "lightweight": 6_770_806,
    "ultralight": 449_876,
    "ultralight_large": 1_946_452,
    "ultralight_large_optimized": 926_347,
    "ultralight44": 885_347,
    "improved_ultralight": 759_252,
    "sk_ultralight": 1_105_563,
    "repvgg_segnet": 4_629_563,
    "hybrid_efficientseg": 960_896,
    "balancedseg": 802_096,
    "balancedseg_fpn": 803_520,
    "balancedseg_fpn_sup": 804_428,
    "balancedseg_crfs": 800_190,
}

# models whose raw logits are not at input resolution (faithful to reference)
OUT_SCALE = {"self_net": 2.0, "lightweight": 0.5}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_forward_shape_and_params(name):
    m = build_model(name, 4)
    v = init_model(m, (32, 32))
    assert count_params(v) == PARAM_COUNTS[name], name
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype("float32")
    out = m.apply(v, x, False)
    assert not isinstance(out, tuple), "eval mode must return a single map"
    s = OUT_SCALE.get(name, 1.0)
    assert out.shape == (1, int(32 * s), int(32 * s), 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["improved_ultralight", "balancedseg",
                                  "balancedseg_fpn_sup"])
def test_deep_supervision_train_outputs(name):
    import jax

    m = build_model(name, 4)
    v = init_model(m, (32, 32), train=True)
    x = np.zeros((1, 32, 32, 3), "float32")
    out = m.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(0)},
                  mutable=["batch_stats"])[0]
    assert isinstance(out, tuple)
    n_aux = {"improved_ultralight": 4, "balancedseg": 2,
             "balancedseg_fpn_sup": 4}[name]
    assert len(out) == n_aux


def test_train_eval_param_trees_match():
    """aux heads etc. must exist in both modes for checkpoint stability."""
    import jax

    for name in ("improved_ultralight", "balancedseg_fpn_sup"):
        m = build_model(name, 4)
        v_eval = init_model(m, (32, 32), train=False)
        v_train = init_model(m, (32, 32), train=True)
        pe = jax.tree_util.tree_structure(v_eval["params"])
        pt = jax.tree_util.tree_structure(v_train["params"])
        assert pe == pt, name


def test_repvgg_fold():
    """RepVGG reparam: deploy-mode forward must match train-arch eval
    forward after folding (reference: nets/RepVGG_Unet.py:63-98)."""
    from tpu_unet.models.ladder import repvgg_segnet
    from tpu_unet.models.repvgg import fold_repvgg

    m = repvgg_segnet(4)
    v = init_model(m, (32, 32))
    # make running stats non-trivial
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(v)
    rng = np.random.RandomState(1)
    leaves = [np.abs(rng.rand(*l.shape).astype("float32")) + 0.1 for l in leaves]
    v = jax.tree_util.tree_unflatten(treedef, leaves)

    x = rng.rand(1, 32, 32, 3).astype("float32")
    y_train_arch = m.apply(v, x, False)

    md = repvgg_segnet(4, deploy=True)
    vd = fold_repvgg(v)
    y_deploy = md.apply(vd, x, False)
    np.testing.assert_allclose(np.asarray(y_train_arch), np.asarray(y_deploy),
                               rtol=2e-4, atol=2e-4)
