"""The reference's multi-seed experiment protocol.

Mirrors `/root/reference/Model_Finetuning.py:304-447`: for each learning rate
in the grid, fine-tune with ``selection_seeds`` seeds and score the run by the
mean over seeds of (val OA + val AA + val kappa)/3; then re-run the best lr
with ``test_seeds`` seeds, evaluating each run on the full scene, and report
mean ± std OA/AA/kappa plus per-class accuracies.

Each seed re-draws the few-shot labeled split (the reference reseeds
numpy/torch globally per run via ``seed_everything(seed)``,
`Model_Finetuning.py:332,381`), so the protocol measures sensitivity to both
init and split.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from hsimae_tpu.config import (
    EvalConfig,
    FinetuneConfig,
    ModelConfig,
    ProtocolConfig,
)
from hsimae_tpu.data.sampling import dual_scene_split
from hsimae_tpu.train.evaluate import evaluate_scene
from hsimae_tpu.train.finetune import dual_branch_finetune
from hsimae_tpu.utils.metrics import Metrics


@dataclasses.dataclass
class ProtocolResult:
    best_lr: float
    selection_scores: Dict[float, float]
    test_metrics: List[Metrics]
    oa_mean: float
    oa_std: float
    aa_mean: float
    aa_std: float
    kappa_mean: float
    kappa_std: float
    per_class_mean: np.ndarray


def _run_one(
    scene_raw: np.ndarray,
    gt: np.ndarray,
    model_cfg: ModelConfig,
    ft_cfg: FinetuneConfig,
    seed: int,
    samples_per_class: int,
    pretrained: Optional[dict],
    gwpca: bool,
    evaluate: bool,
    eval_cfg: EvalConfig,
):
    rng = np.random.default_rng(seed)
    split = dual_scene_split(
        scene_raw, gt, patch_size=model_cfg.img_size,
        num=samples_per_class, gwpca=gwpca, nc=model_cfg.bands, rng=rng,
    )
    res = dual_branch_finetune(split, model_cfg, ft_cfg, pretrained=pretrained, seed=seed)
    test_m = None
    if evaluate:
        test_m = evaluate_scene(
            split.scene, split.test_gt, res.params,
            res.model_cfg, res.num_classes, eval_cfg,
        ).metrics
    return res.val_metrics, test_m


def _runs_path(resume_dir: str) -> str:
    return os.path.join(resume_dir, "protocol_runs.jsonl")


def _load_completed(resume_dir: Optional[str]) -> Dict[tuple, dict]:
    """Completed-run records keyed by (stage, lr, seed, spc). Corrupt or
    truncated lines (a kill mid-append) are skipped: the run just re-runs."""
    done: Dict[tuple, dict] = {}
    if not resume_dir:
        return done
    try:
        with open(_runs_path(resume_dir)) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done[(r["stage"], r["lr"], r["seed"], r["spc"])] = r
                except (json.JSONDecodeError, KeyError):
                    continue
    except OSError:
        pass
    return done


def _append_run(resume_dir: Optional[str], rec: dict) -> None:
    if not resume_dir:
        return
    os.makedirs(resume_dir, exist_ok=True)
    with open(_runs_path(resume_dir), "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())


def run_protocol(
    scene_raw: np.ndarray,
    gt: np.ndarray,
    model_cfg: ModelConfig,
    ft_cfg: FinetuneConfig = FinetuneConfig(),
    proto: ProtocolConfig = ProtocolConfig(),
    eval_cfg: EvalConfig = EvalConfig(),
    samples_per_class: int = 10,
    pretrained: Optional[dict] = None,
    gwpca: bool = True,
    verbose: bool = True,
    resume_dir: Optional[str] = None,
) -> ProtocolResult:
    """``resume_dir`` makes the protocol preemption-safe: every completed
    (lr, seed) run is appended to ``protocol_runs.jsonl`` there, and a
    restarted call skips runs already on disk — on real datasets the full
    protocol is 17 x 200-epoch finetunes per budget (a multi-day job,
    `/root/reference/Model_Finetuning.py:304-447`), and losing completed
    runs to a preemption would be unaffordable. Each run is independently
    seeded, so skip-and-continue reproduces the uninterrupted result."""
    done = _load_completed(resume_dir)
    spc = samples_per_class

    # ---- stage 1: lr selection on val, selection_seeds runs each ----------
    scores: Dict[float, float] = {}
    for lr in proto.lr_grid:
        vals = []
        for seed in proto.seeds[: proto.selection_seeds]:
            key = ("select", lr, seed, spc)
            if key in done:
                vals.append(done[key]["val_mean3"])
                continue
            vm, _ = _run_one(
                scene_raw, gt, model_cfg,
                dataclasses.replace(ft_cfg, lr=lr),
                seed, samples_per_class, pretrained, gwpca,
                evaluate=False, eval_cfg=eval_cfg,
            )
            vals.append(vm.mean3)
            _append_run(resume_dir, {"stage": "select", "lr": lr,
                                     "seed": seed, "spc": spc,
                                     "val_mean3": vm.mean3})
        scores[lr] = float(np.mean(vals))
        if verbose:
            print(f"[protocol] lr={lr:g}: selection score {scores[lr]:.4f}")
    best_lr = max(scores, key=scores.get)

    # ---- stage 2: test_seeds full runs at best lr --------------------------
    test_ms: List[Metrics] = []
    for seed in proto.seeds[: proto.test_seeds]:
        key = ("test", best_lr, seed, spc)
        if key in done:
            r = done[key]
            tm = Metrics(oa=r["oa"], aa=r["aa"], kappa=r["kappa"],
                         per_class=np.asarray(r["per_class"]))
        else:
            _, tm = _run_one(
                scene_raw, gt, model_cfg,
                dataclasses.replace(ft_cfg, lr=best_lr),
                seed, samples_per_class, pretrained, gwpca,
                evaluate=True, eval_cfg=eval_cfg,
            )
            _append_run(resume_dir, {
                "stage": "test", "lr": best_lr, "seed": seed, "spc": spc,
                "oa": tm.oa, "aa": tm.aa, "kappa": tm.kappa,
                "per_class": [float(x) for x in tm.per_class]})
        test_ms.append(tm)
        if verbose:
            print(f"[protocol] seed {seed}: test {tm}")

    oas = np.array([m.oa for m in test_ms])
    aas = np.array([m.aa for m in test_ms])
    kps = np.array([m.kappa for m in test_ms])
    width = max(len(m.per_class) for m in test_ms)
    pcs = np.stack([
        np.pad(m.per_class, (0, width - len(m.per_class))) for m in test_ms
    ])
    return ProtocolResult(
        best_lr=best_lr,
        selection_scores=scores,
        test_metrics=test_ms,
        oa_mean=float(oas.mean()), oa_std=float(oas.std()),
        aa_mean=float(aas.mean()), aa_std=float(aas.std()),
        kappa_mean=float(kps.mean()), kappa_std=float(kps.std()),
        per_class_mean=pcs.mean(axis=0),
    )
