"""Training-callback tests: early stopping triggers, best-epoch weights are
restored, val recall@k is computed for callbacks to monitor (the role of the
reference's Lightning EarlyStopping/ModelCheckpoint via get_trainer_func)."""

import numpy as np
import pandas as pd
import pytest

import jax

from rectools_tpu import Columns
from rectools_tpu.dataset import Dataset
from rectools_tpu.models import SASRecModel
from rectools_tpu.models.nn.transformers import (
    BestStateKeeper,
    EarlyStopping,
    TrainingCallback,
    leave_one_out_mask,
)

from ...data import DATASET

TINY = dict(n_blocks=1, n_heads=2, n_factors=8, session_max_len=4, batch_size=4, seed=32, dropout_rate=0.0)


def _fit_with(callbacks, epochs=6, val_recall_k=None, dataset=DATASET):
    model = SASRecModel(
        get_val_mask_func=leave_one_out_mask,
        epochs=epochs,
        get_callbacks_func=lambda: callbacks,
        training_module_kwargs={"val_recall_k": val_recall_k},
        **TINY,
    )
    model.fit(dataset)
    return model


class RecordingCallback(TrainingCallback):
    def __init__(self):
        self.started = 0
        self.ended = 0
        self.epoch_logs = []

    def on_train_start(self, module):
        self.started += 1

    def on_epoch_end(self, module, epoch, logs):
        self.epoch_logs.append((epoch, dict(logs)))
        return False

    def on_train_end(self, module):
        self.ended += 1


class TestCallbackProtocol:
    def test_hooks_fire_with_logs(self) -> None:
        recorder = RecordingCallback()
        model = _fit_with([recorder], epochs=2)
        assert recorder.started == 1
        assert recorder.ended == 1
        assert len(recorder.epoch_logs) == 2
        epochs = [e for e, _ in recorder.epoch_logs]
        assert epochs == [1, 2]
        for _, logs in recorder.epoch_logs:
            assert "train_loss" in logs
            assert "val_loss" in logs
        assert model.training_module.epochs_completed == 2

    def test_val_recall_metric_logged(self) -> None:
        recorder = RecordingCallback()
        model = _fit_with([recorder], epochs=2, val_recall_k=3)
        for _, logs in recorder.epoch_logs:
            assert "val_recall@3" in logs
            assert 0.0 <= logs["val_recall@3"] <= 1.0
        assert len(model.training_module.val_metric_history["val_recall@3"]) == 2

    def test_stop_request_breaks_loop(self) -> None:
        class StopAfterOne(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                return True

        model = _fit_with([StopAfterOne()], epochs=7)
        assert model.training_module.epochs_completed == 1
        assert model.is_fitted


class TestEarlyStopping:
    def test_stops_on_plateau(self) -> None:
        # monitor a synthetic metric so the trigger point is deterministic
        class ConstantMetric(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                logs["plateau"] = 1.0
                return False

        stopper = EarlyStopping(monitor="plateau", patience=2)
        model = _fit_with([ConstantMetric(), stopper], epochs=10)
        # epoch 1 sets best; epochs 2 and 3 fail to improve -> stop at 3
        assert model.training_module.epochs_completed == 3
        assert stopper.stopped_epoch == 3

    def test_improvement_resets_patience(self) -> None:
        values = iter([5.0, 4.0, 3.0, 3.0, 3.0, 3.0, 3.0])

        class ScriptedMetric(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                logs["scripted"] = next(values)
                return False

        stopper = EarlyStopping(monitor="scripted", patience=2)
        model = _fit_with([ScriptedMetric(), stopper], epochs=10)
        # improves through epoch 3, then two flat epochs -> stop at 5
        assert model.training_module.epochs_completed == 5

    def test_missing_monitor_warns_and_never_stops(self) -> None:
        stopper = EarlyStopping(monitor="no_such_metric", patience=1)
        with pytest.warns(UserWarning, match="no_such_metric"):
            model = _fit_with([stopper], epochs=3)
        assert model.training_module.epochs_completed == 3

    def test_max_mode(self) -> None:
        values = iter([0.5, 0.4, 0.3, 0.2])

        class Declining(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                logs["metric"] = next(values)
                return False

        stopper = EarlyStopping(monitor="metric", patience=2, mode="max")
        model = _fit_with([Declining(), stopper], epochs=10)
        assert model.training_module.epochs_completed == 3


class TestBestStateKeeper:
    def test_best_epoch_weights_restored(self) -> None:
        values = iter([3.0, 1.0, 2.0, 4.0])
        snapshots = {}

        class ScriptedMetric(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                logs["scripted"] = next(values)
                snapshots[epoch] = jax.tree.map(np.asarray, module.params)
                return False

        keeper = BestStateKeeper(monitor="scripted", mode="min")
        model = _fit_with([ScriptedMetric(), keeper], epochs=4)
        assert keeper.best_epoch == 2
        restored = jax.tree.map(np.asarray, model.training_module.params)
        best = snapshots[2]
        last = snapshots[4]
        flat_restored = jax.tree.leaves(restored)
        flat_best = jax.tree.leaves(best)
        flat_last = jax.tree.leaves(last)
        for r, b in zip(flat_restored, flat_best):
            np.testing.assert_array_equal(r, b)
        # and the restored state genuinely differs from the final epoch's
        assert any(not np.array_equal(r, l) for r, l in zip(flat_restored, flat_last))

    def test_recommend_uses_restored_weights(self) -> None:
        # fitting with a keeper must leave the model serving the best epoch
        values = iter([1.0, 2.0, 3.0])

        class ScriptedMetric(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                logs["scripted"] = next(values)
                return False

        keeper = BestStateKeeper(monitor="scripted", mode="min")
        model = _fit_with([ScriptedMetric(), keeper], epochs=3)
        assert keeper.best_epoch == 1
        reco = model.recommend([10, 20], DATASET, k=3, filter_viewed=False)
        assert len(reco) > 0


class TestEarlyStoppingWarmup:
    def test_warmup_suppresses_initial_dip(self) -> None:
        # dips for 3 epochs then climbs — the recommender cold-start pattern
        values = iter([0.10, 0.09, 0.08, 0.12, 0.15, 0.18, 0.18, 0.18, 0.18])

        class Scripted(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                logs["metric"] = next(values)
                return False

        no_warmup = EarlyStopping(monitor="metric", patience=2, mode="max")
        model = _fit_with([Scripted(), no_warmup], epochs=9)
        assert model.training_module.epochs_completed == 3  # fired inside the dip

        values2 = iter([0.10, 0.09, 0.08, 0.12, 0.15, 0.18, 0.18, 0.18, 0.18])

        class Scripted2(TrainingCallback):
            def on_epoch_end(self, module, epoch, logs):
                logs["metric"] = next(values2)
                return False

        warm = EarlyStopping(monitor="metric", patience=2, mode="max", warmup_epochs=4)
        model = _fit_with([Scripted2(), warm], epochs=9)
        # monitoring starts after epoch 4: improvements at 5,6 then 2 flat -> stop at 8
        assert model.training_module.epochs_completed == 8
