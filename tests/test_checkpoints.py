"""Checkpoint tests: save/restore, subtree graft, full-train-state snapshot."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from samplenet_tpu.train import checkpoints
from samplenet_tpu.train.state import TrainState


class TestBasicRoundtrip:
    def test_pytree_roundtrip(self, tmp_path):
        tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                "b": {"c": np.asarray([1, 2, 3], np.int32)}}
        path = str(tmp_path / "ckpt")
        checkpoints.save(path, tree)
        out = checkpoints.restore(path)
        np.testing.assert_allclose(out["a"], tree["a"])
        np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])

    def test_restore_subtree(self, tmp_path):
        tree = {"params": {"w": np.ones(3, np.float32)}, "step": np.int32(7)}
        path = str(tmp_path / "ckpt")
        checkpoints.save(path, tree)
        params = checkpoints.restore_subtree(path, "params")
        np.testing.assert_allclose(params["w"], 1.0)


class TestGraft:
    def test_replaces_subtree(self):
        target = {"sampler": {"w": 1}, "classifier": {"w": 2}}
        out = checkpoints.graft(target, {"w": 99}, at="classifier")
        assert out["classifier"]["w"] == 99
        assert out["sampler"]["w"] == 1
        assert target["classifier"]["w"] == 2  # original untouched

    def test_missing_key_raises(self):
        with pytest.raises(KeyError):
            checkpoints.graft({"a": 1}, {}, at="missing")


class TestTrainStateSnapshot:
    def test_roundtrip_preserves_optimizer_state(self, tmp_path):
        tx = optax.adam(1e-3)
        state = TrainState.create(
            params={"w": jnp.ones(4)}, batch_stats={"m": jnp.zeros(2)}, tx=tx)
        # take two steps so adam moments are non-trivial
        for _ in range(2):
            state = state.apply_gradients({"w": jnp.ones(4)})
        path = str(tmp_path / "snap")
        checkpoints.save_train_state(path, state,
                                     extras={"epoch": 5, "best_acc": 0.75})
        fresh = TrainState.create(
            params={"w": jnp.ones(4)}, batch_stats={"m": jnp.zeros(2)}, tx=tx)
        restored, extras = checkpoints.restore_train_state(path, fresh)
        assert int(restored.step) == 2
        assert extras["epoch"] == 5 and extras["best_acc"] == 0.75
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.asarray(state.params["w"]))
        # continuing training from the snapshot matches continuing directly
        cont_a = state.apply_gradients({"w": jnp.ones(4)})
        cont_b = restored.apply_gradients({"w": jnp.ones(4)})
        np.testing.assert_allclose(np.asarray(cont_a.params["w"]),
                                   np.asarray(cont_b.params["w"]), atol=1e-7)
