"""Smoke test for examples/quickstart.py — the documented end-to-end path.

Runs the example's exact workflow (pretrain -> finetune -> evaluate ->
export -> serve) at a minimal budget so the public entry point can't rot.
"""

import importlib.util
import pathlib

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def _load_quickstart():
    spec = importlib.util.spec_from_file_location(
        "quickstart_example", REPO / "examples" / "quickstart.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quickstart_end_to_end(tmp_path):
    qs = _load_quickstart()
    labels = qs.main(str(tmp_path), scenes=2, scene_size=32,
                     pt_epochs=1, ft_epochs=2)

    # served labels: 1-based classes, background (0) excluded at argmax
    labels = np.asarray(labels)
    assert labels.shape == (5,)
    assert labels.min() >= 1

    # every stage left its artifact behind
    assert (tmp_path / "pt" / "params_final.msgpack").exists()
    assert (tmp_path / "ft" / "finetuned.msgpack").exists()
    assert (tmp_path / "model.hsix").exists()
    assert list((tmp_path / "maps").glob("*.png"))
    assert list((tmp_path / "maps_artifact").glob("*.png"))
