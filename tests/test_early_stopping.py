"""EarlyStopping semantics + donation-safety of best-state snapshots."""
import numpy as np

from tpu_unet.train.callbacks import EarlyStopping


def test_early_stopping_patience_and_restore():
    es = EarlyStopping(patience=2, min_delta=0.0)
    assert not es(1.0, {"v": 1})
    assert not es(0.9, {"v": 2})      # improvement resets counter
    assert not es(0.95, {"v": 3})     # 1st bad epoch
    assert es(0.96, {"v": 4})         # 2nd bad epoch → stop
    assert es.load_best_model() == {"v": 2}


def test_early_stopping_lazy_snapshot():
    es = EarlyStopping(patience=5)
    calls = []

    def snap(val):
        return lambda: calls.append(val) or {"val": val}

    es(1.0, snap("a"))
    es(2.0, snap("b"))    # worse: thunk must NOT be materialized
    es(0.5, snap("c"))
    assert calls == ["a", "c"]
    assert es.load_best_model() == {"val": "c"}


def test_best_state_survives_buffer_donation():
    """Regression: snapshots taken from a donated TrainState must remain
    readable after the next step consumes the buffers."""
    import jax

    from tpu_unet.models.registry import build_model, init_model
    from tpu_unet.train.step import (StepConfig, create_train_state,
                                     make_optimizer, make_train_step)

    model = build_model("ultralight", 4)
    v = init_model(model, (32, 32), train=True)
    cfg = StepConfig(num_classes=4, cls_weights=(1, 1, 1, 1))
    state = create_train_state(model, v, make_optimizer("adam"))
    step = make_train_step(model, cfg)
    rng = np.random.RandomState(0)
    batch = {"image": rng.randint(0, 255, (4, 32, 32, 3)).astype("uint8"),
             "label": rng.randint(0, 4, (4, 32, 32)).astype("int32")}

    es = EarlyStopping(patience=3)
    state, _ = step(state, batch, 1e-3, jax.random.PRNGKey(0))
    es(1.0, lambda: jax.tree_util.tree_map(
        np.asarray, {"params": state.params}))
    state, _ = step(state, batch, 1e-3, jax.random.PRNGKey(1))  # donates
    best = es.load_best_model()
    # must not raise "Array has been deleted"
    total = sum(np.asarray(x).sum() for x in
                jax.tree_util.tree_leaves(best["params"]))
    assert np.isfinite(total)
