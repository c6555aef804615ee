"""Patience-based early stopping with best-checkpoint retention.

Functional equivalent of `/root/reference/Utils/Early_Stop.py:4-46`, with its
latent first-call bug fixed (the reference leaves ``metric_max`` unset until
the first improvement, crashing if the metric drops immediately). Instead of
writing a torch ``state_dict`` it hands the best params back through a
callback so any checkpointer can be plugged in.
"""

from __future__ import annotations

from typing import Callable, Optional


class EarlyStopping:
    def __init__(self, patience: int = 7, delta: float = 0.0, verbose: bool = False):
        self.patience = patience
        self.delta = delta
        self.verbose = verbose
        self.counter = 0
        self.best_metric: Optional[float] = None
        self.best_value = None
        self.early_stop = False

    def __call__(self, metric: float, value=None, on_improve: Optional[Callable] = None) -> bool:
        """Report a new validation metric. Returns True if training should stop."""
        if self.best_metric is None or metric >= self.best_metric + self.delta:
            if self.verbose and self.best_metric is not None:
                print(f"metric improved ({self.best_metric:.6f} -> {metric:.6f})")
            self.best_metric = metric
            self.best_value = value
            self.counter = 0
            if on_improve is not None:
                on_improve()
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop
