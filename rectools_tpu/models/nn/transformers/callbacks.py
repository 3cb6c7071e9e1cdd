"""Training callbacks: per-epoch hooks, early stopping, best-state retention.

The reference reaches these through a user-supplied pytorch-lightning Trainer
(`get_trainer_func` with `EarlyStopping` / `ModelCheckpoint`,
rectools/models/nn/transformers/base.py:367-380; the HSTU tutorial checkpoints
on best validation recall). Here the hooks are first-class on the JAX training
loop: pass instances via ``training_module_kwargs={"callbacks": [...]}``.

Monitorable values per epoch: ``train_loss``, ``val_loss`` (when a validation
mask is configured), and ``val_recall@{k}`` (when the training module's
``val_recall_k`` is set). Best-state retention keeps a host-side snapshot of
the parameter/optimizer trees and restores it when training ends, so the
fitted model serves the best epoch rather than the last one.
"""

import typing as tp
import warnings

import jax
import numpy as np

if tp.TYPE_CHECKING:  # pragma: no cover
    from .training import TransformerTrainingModule


class TrainingCallback:
    """Per-epoch hook protocol for `TransformerTrainingModule.fit`."""

    def on_train_start(self, module: "TransformerTrainingModule") -> None:
        """Called once when a fit loop starts (also on fit_partial resumes)."""

    def on_epoch_end(
        self, module: "TransformerTrainingModule", epoch: int, logs: tp.Dict[str, float]
    ) -> bool:
        """Called after each epoch with the epoch's metric logs.

        Return True to stop training after this epoch.
        """
        return False

    def on_train_end(self, module: "TransformerTrainingModule") -> None:
        """Called when the fit loop finishes (exhausted or stopped early)."""


class _MonitorMixin:
    """Shared improvement tracking over a monitored metric."""

    monitor: str
    mode: str
    min_delta: float

    def _init_monitor(self, monitor: str, mode: str, min_delta: float) -> None:
        if mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', got {mode}")
        self.monitor = monitor
        self.mode = mode
        self.min_delta = min_delta
        self.best_value: tp.Optional[float] = None
        self._warned_missing = False

    def _metric(self, logs: tp.Dict[str, float]) -> tp.Optional[float]:
        value = logs.get(self.monitor)
        if value is None and not self._warned_missing:
            warnings.warn(
                f"Monitored metric `{self.monitor}` is not in epoch logs {sorted(logs)}; "
                "callback is inactive. Configure a validation mask (and `val_recall_k` "
                "for recall monitors) on the training module."
            )
            self._warned_missing = True
        return value

    def _improved(self, value: float) -> bool:
        if self.best_value is None:
            return True
        if self.mode == "min":
            return value < self.best_value - self.min_delta
        return value > self.best_value + self.min_delta


class EarlyStopping(TrainingCallback, _MonitorMixin):
    """Stop when the monitored metric hasn't improved for `patience` epochs.

    ``warmup_epochs`` delays monitoring: recommendation metrics routinely DIP
    for the first few epochs while embeddings leave their random init (the
    model predicts popularity before it predicts taste), and a small patience
    fires inside that dip. Measured on the ML-1M-scale quality gate: SASRec's
    val recall@10 declines until ~epoch 5, then climbs 4x over 60 epochs.
    """

    def __init__(
        self,
        monitor: str = "val_loss",
        patience: int = 1,
        min_delta: float = 0.0,
        mode: str = "min",
        warmup_epochs: int = 0,
    ):
        self._init_monitor(monitor, mode, min_delta)
        self.patience = patience
        self.warmup_epochs = warmup_epochs
        self.wait = 0
        self._epochs_seen = 0
        self.stopped_epoch: tp.Optional[int] = None

    def on_train_start(self, module: "TransformerTrainingModule") -> None:
        self.wait = 0
        self._epochs_seen = 0

    def on_epoch_end(self, module: "TransformerTrainingModule", epoch: int, logs: tp.Dict[str, float]) -> bool:
        value = self._metric(logs)
        if value is None:
            return False
        self._epochs_seen += 1
        if self._epochs_seen <= self.warmup_epochs:
            if self._improved(value):
                self.best_value = value
            return False
        if self._improved(value):
            self.best_value = value
            self.wait = 0
            return False
        self.wait += 1
        if self.wait >= self.patience:
            self.stopped_epoch = epoch
            return True
        return False


class BestStateKeeper(TrainingCallback, _MonitorMixin):
    """Snapshot the best-epoch parameters and restore them after training.

    The counterpart of the reference's `ModelCheckpoint(save_top_k=1)` +
    best-checkpoint reload, without filesystem round trips: snapshots are
    host numpy trees, restored onto the training module's device/mesh layout
    at `on_train_end`.
    """

    def __init__(self, monitor: str = "val_loss", mode: str = "min", min_delta: float = 0.0):
        self._init_monitor(monitor, mode, min_delta)
        self.best_epoch: tp.Optional[int] = None
        self._params_snapshot: tp.Optional[tp.Any] = None
        self._opt_snapshot: tp.Optional[tp.Any] = None

    def on_epoch_end(self, module: "TransformerTrainingModule", epoch: int, logs: tp.Dict[str, float]) -> bool:
        value = self._metric(logs)
        if value is None:
            return False
        if self._improved(value):
            self.best_value = value
            self.best_epoch = epoch
            self._params_snapshot = jax.tree.map(np.asarray, module.params)
            self._opt_snapshot = jax.tree.map(np.asarray, module.opt_state)
        return False

    def on_train_end(self, module: "TransformerTrainingModule") -> None:
        if self._params_snapshot is None:
            return
        # device_put onto each live leaf's sharding keeps the mesh layout
        module.params = jax.tree.map(
            lambda ref, val: jax.device_put(val, ref.sharding), module.params, self._params_snapshot
        )
        module.opt_state = jax.tree.map(
            lambda ref, val: jax.device_put(val, ref.sharding), module.opt_state, self._opt_snapshot
        )
