"""Import-surface stub for pytorch_lightning: just enough for the reference's
transformer/data-preparator/backbone modules to import. Training through a
Trainer is NOT supported — parity tests only exercise the lightning-free
torch math (preparators, torch backbone, layer families)."""

import torch


class LightningModule(torch.nn.Module):
    def save_hyperparameters(self, *args, **kwargs):
        pass

    def log(self, *args, **kwargs):
        pass

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")


class Callback:
    pass


class Trainer:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("pytorch_lightning stub: Trainer is unavailable in parity tests")


def seed_everything(seed, workers=False):
    import numpy as np

    torch.manual_seed(seed)
    np.random.seed(seed)
    return seed
