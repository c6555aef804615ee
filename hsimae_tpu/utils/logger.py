"""Structured metric logging.

The reference logs via prints, `.npy` loss dumps and matplotlib PNGs
(`/root/reference/Model_Pretraining.py:112-113`,
`/root/reference/Model_Finetuning.py:132-137,223-239`). Here: a JSONL metric
stream plus helpers that reproduce the same artifacts (loss history array,
twin-axis loss/accuracy curve PNG).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "train", echo: bool = True):
        self.log_dir = log_dir
        self.echo = echo
        self._fh = None
        self.history: List[Dict] = []
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
        self._t0 = time.monotonic()

    def log(self, step: Optional[int] = None, **metrics) -> None:
        rec = {"t": round(time.monotonic() - self._t0, 3)}
        if step is not None:
            rec["step"] = step
        rec.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()})
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.echo:
            body = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k not in ("t",)
            )
            print(f"[{rec['t']:9.2f}s] {body}", flush=True)

    def series(self, key: str) -> List[float]:
        return [r[key] for r in self.history if key in r]

    def save_history_npy(self, path: str, keys=("train_loss", "val_loss")) -> None:
        """Reference-compatible loss history dump (`Model_Pretraining.py:112`)."""
        import numpy as np

        hist = [self.series(k) for k in keys]
        np.save(path, np.array(hist, dtype=object), allow_pickle=True)

    def save_curves_png(self, path: str) -> None:
        """Twin-axis loss / average-accuracy plot (`Model_Finetuning.py:132-137`)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax1 = plt.subplots()
        ax1.set_xlabel("epoch")
        ax1.set_ylabel("loss")
        ax2 = ax1.twinx()
        ax2.set_ylabel("Average Accuracy")
        lns = []
        for key, style, ax in (
            ("train_loss", "b", ax1),
            ("val_loss", "g", ax1),
            ("train_aa", "y", ax2),
            ("val_aa", "r", ax2),
        ):
            ys = self.series(key)
            if ys:
                lns += ax.plot(ys, style, lw=1, label=key)
        if lns:
            ax1.legend(lns, [l.get_label() for l in lns], loc="center right")
        fig.savefig(path)
        plt.close(fig)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def plot_history(path: str, hist: Dict[str, List[float]]) -> None:
    """Twin-axis loss / accuracy curves from a history dict — the reference's
    live matplotlib figure (`Model_Finetuning.py:132-137,223-233`), rendered
    once at the end. Keys containing 'loss' go on the left axis, the rest on
    the right. ``val_*`` series are plotted against ``hist['val_epoch']``
    when present, so eval_every > 1 keeps the curves horizontally aligned
    with the per-epoch train series."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax1 = plt.subplots()
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("loss")
    ax2 = ax1.twinx()
    ax2.set_ylabel("Average Accuracy")
    lns = []
    styles = iter(["b", "g", "c", "y", "r", "m", "k"])
    val_x = hist.get("val_epoch") or None
    for key, ys in hist.items():
        if not ys or key == "val_epoch":
            continue
        ax = ax1 if "loss" in key else ax2
        xs = (val_x if key.startswith("val_") and val_x is not None
              and len(val_x) == len(ys) else list(range(len(ys))))
        lns += ax.plot(xs, ys, next(styles, "k"), lw=1, label=key)
    if lns:
        ax1.legend(lns, [l.get_label() for l in lns], loc="center right")
    fig.savefig(path)
    plt.close(fig)
