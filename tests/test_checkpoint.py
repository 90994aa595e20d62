import jax.numpy as jnp
import numpy as np
import pytest

from rtts.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def _tree(scale=1.0):
    return {"params": {"a": jnp.ones((3, 4)) * scale,
                       "list": [jnp.zeros((2,)), jnp.ones((5,)) * scale]},
            "opt_state": {"mu": jnp.full((3, 4), 0.5 * scale)},
            "step_arr": jnp.asarray(7)}


def test_save_restore_round_trip(tmp_path):
    t = _tree(2.0)
    save_checkpoint(tmp_path, t, step=10, metric=1.5)
    path = latest_checkpoint(tmp_path)
    assert path and path.endswith("step_10")
    restored, step = restore_checkpoint(path, _tree(0.0))
    assert step == 10
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]),
                                  np.asarray(t["params"]["a"]))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["mu"]),
                                  np.asarray(t["opt_state"]["mu"]))


def test_partial_restore_params_only(tmp_path):
    t = _tree(3.0)
    save_checkpoint(tmp_path, t, step=5)
    restored, step = restore_checkpoint(latest_checkpoint(tmp_path),
                                        {"params": _tree(0.0)["params"]})
    np.testing.assert_array_equal(np.asarray(restored["params"]["list"][1]),
                                  np.asarray(t["params"]["list"][1]))


def test_retention_keeps_latest_and_best(tmp_path):
    for step, metric in [(1, 5.0), (2, 1.0), (3, 3.0), (4, 4.0), (5, 2.0)]:
        save_checkpoint(tmp_path, _tree(step), step=step, metric=metric,
                        keep=3)
    kept = sorted(p.name for p in tmp_path.glob("step_*"))
    assert "step_5" in kept          # latest always kept
    assert "step_2" in kept          # best metric kept
    assert len(kept) <= 3


def test_shape_mismatch_raises(tmp_path):
    save_checkpoint(tmp_path, {"params": {"a": jnp.ones((3, 4))}}, step=1)
    with pytest.raises(ValueError, match="shape"):
        restore_checkpoint(latest_checkpoint(tmp_path),
                           {"params": {"a": jnp.ones((2, 2))}})


def test_missing_leaf_raises(tmp_path):
    save_checkpoint(tmp_path, {"params": {"a": jnp.ones(2)}}, step=1)
    with pytest.raises(ValueError, match="missing"):
        restore_checkpoint(latest_checkpoint(tmp_path),
                           {"params": {"a": jnp.ones(2), "b": jnp.ones(2)}})
