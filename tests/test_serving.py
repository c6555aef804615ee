"""Serving artifact tests: export -> load -> parity with the live model.

The artifact must reproduce the live classifier's logits exactly (same
XLA-compiled math, CPU lowering) through save/load, padding, bucket
selection, and chunked dispatch.
"""

import numpy as np
import pytest

import jax

from hsimae_tpu.config import ModelConfig
from hsimae_tpu.models.hsimae import HSIMAE, build_hsi_vit, init_model
from hsimae_tpu.serving import export_classifier, load_classifier
from hsimae_tpu.serving.export import save_classifier

CFG = ModelConfig(embed_dim=32, depth=2, s_depth=1, decoder_dim=16,
                  decoder_depth=1, num_classes=0)
NUM_CLASSES = 5


@pytest.fixture(scope="module")
def artifact_and_oracle(tmp_path_factory):
    model = build_hsi_vit(CFG, NUM_CLASSES)
    params = init_model(model, seed=3)["params"]
    blob = export_classifier(params, CFG, NUM_CLASSES,
                             batch_sizes=(2, 8), platforms=("cpu",))
    path = save_classifier(
        str(tmp_path_factory.mktemp("srv") / "model.hsix"), blob)

    def oracle(x):
        return np.asarray(model.apply(
            {"params": params}, x, False, method=HSIMAE.classify))

    return path, oracle


def test_export_load_logits_parity(artifact_and_oracle):
    path, oracle = artifact_and_oracle
    clf = load_classifier(path)
    x = np.random.default_rng(0).standard_normal(
        (8, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
    np.testing.assert_allclose(clf.predict_logits(x), oracle(x),
                               rtol=1e-5, atol=1e-5)


def test_padding_and_bucket_selection(artifact_and_oracle):
    path, oracle = artifact_and_oracle
    clf = load_classifier(path)
    rng = np.random.default_rng(1)
    # n=1 pads into the 2-bucket; n=3 pads into the 8-bucket; n=8 exact
    for n in (1, 3, 8):
        x = rng.standard_normal(
            (n, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
        got = clf.predict_logits(x)
        assert got.shape == (n, NUM_CLASSES)
        np.testing.assert_allclose(got, oracle(x), rtol=1e-5, atol=1e-5)


def test_chunked_dispatch_above_largest_bucket(artifact_and_oracle):
    path, oracle = artifact_and_oracle
    clf = load_classifier(path)
    x = np.random.default_rng(2).standard_normal(
        (19, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
    got = clf.predict_logits(x)  # 8 + 8 + pad(3->8)
    assert got.shape == (19, NUM_CLASSES)
    np.testing.assert_allclose(got, oracle(x), rtol=1e-5, atol=1e-5)


def test_predict_labels_are_1based_background_excluded(artifact_and_oracle):
    path, _ = artifact_and_oracle
    clf = load_classifier(path)
    x = np.random.default_rng(3).standard_normal(
        (4, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
    labels = clf.predict(x)
    assert labels.dtype == np.int32
    assert labels.min() >= 1 and labels.max() <= NUM_CLASSES - 1


def test_empty_batch(artifact_and_oracle):
    path, _ = artifact_and_oracle
    clf = load_classifier(path)
    x = np.zeros((0, CFG.img_size, CFG.img_size, CFG.bands), np.float32)
    assert clf.predict_logits(x).shape == (0, NUM_CLASSES)


def test_cross_platform_artifact_runs_on_cpu():
    # the production default lowers for BOTH cpu and tpu in one artifact;
    # cross-lowering needs no TPU present and the cpu program must still run
    model = build_hsi_vit(CFG, NUM_CLASSES)
    params = init_model(model, seed=7)["params"]
    blob = export_classifier(params, CFG, NUM_CLASSES,
                             batch_sizes=(2,), platforms=("cpu", "tpu"))
    clf = load_classifier(blob)
    x = np.random.default_rng(7).standard_normal(
        (2, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
    want = np.asarray(model.apply({"params": params}, x, False,
                                  method=HSIMAE.classify))
    np.testing.assert_allclose(clf.predict_logits(x), want,
                               rtol=1e-5, atol=1e-5)


def test_pretrain_only_checkpoint_rejected():
    from hsimae_tpu.models.hsimae import build_hsimae

    pt_model = build_hsimae(CFG)
    pt_params = init_model(pt_model, seed=0)["params"]
    with pytest.raises(ValueError, match="cls_head"):
        export_classifier(pt_params, CFG, NUM_CLASSES,
                          batch_sizes=(2,), platforms=("cpu",))


def test_artifact_metadata(artifact_and_oracle):
    path, _ = artifact_and_oracle
    clf = load_classifier(path)
    assert clf.num_classes == NUM_CLASSES
    assert clf.batch_sizes == [2, 8]
    assert int(clf.model_meta["embed_dim"]) == CFG.embed_dim


def test_export_cli(tmp_path):
    from hsimae_tpu.checkpoints.io import save_params
    from hsimae_tpu.cli.export import build_parser, main
    from hsimae_tpu.cli.common import model_config

    # params must match the config the CLI will build from its args
    argv = ["--params", "PLACEHOLDER", "--num-classes", str(NUM_CLASSES),
            "--output", str(tmp_path / "model.hsix"),
            "--batch-sizes", "2", "--platforms", "cpu",
            "--model", "HSIMAE-S"]
    cli_cfg = model_config(build_parser().parse_args(argv))
    model = build_hsi_vit(cli_cfg, NUM_CLASSES)
    params = init_model(model, seed=0)["params"]
    ckpt = str(tmp_path / "ft.msgpack")
    save_params(ckpt, params)
    argv[1] = ckpt
    main(argv)
    assert load_classifier(str(tmp_path / "model.hsix")).num_classes == NUM_CLASSES


def test_bf16_params_artifact(tmp_path):
    # half-size artifact; logits stay close to the f32 oracle
    model = build_hsi_vit(CFG, NUM_CLASSES)
    params = init_model(model, seed=11)["params"]
    blob32 = export_classifier(params, CFG, NUM_CLASSES,
                               batch_sizes=(4,), platforms=("cpu",))
    blob16 = export_classifier(params, CFG, NUM_CLASSES,
                               batch_sizes=(4,), platforms=("cpu",),
                               params_dtype="bfloat16")
    assert len(blob16) < 0.75 * len(blob32)
    clf = load_classifier(blob16)
    x = np.random.default_rng(11).standard_normal(
        (4, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
    want = np.asarray(model.apply({"params": params}, x, False,
                                  method=HSIMAE.classify))
    got = clf.predict_logits(x)
    # bf16 params: ~3 decimal digits of mantissa
    np.testing.assert_allclose(got, want, rtol=0.08, atol=0.08)


def test_metadata_roundtrip_types(artifact_and_oracle):
    # dtype fields come back as jnp.dtype-able strings; '__none__' inverts
    import jax.numpy as jnp

    from hsimae_tpu.serving.export import _unjsonify

    path, _ = artifact_and_oracle
    meta = load_classifier(path).model_meta
    assert jnp.dtype(meta["compute_dtype"]) == jnp.float32
    assert meta["embed_dim"] == CFG.embed_dim
    assert _unjsonify({"a": "__none__", "b": {"c": "__none__"}, "d": 3}) == \
        {"a": None, "b": {"c": None}, "d": 3}


def test_mismatched_model_args_warn():
    # wrong geometry vs checkpoint where the cls head still matches (the
    # hard-error path can't catch it): SwiGLU hidden dims differ, the
    # encoder MLPs stay at random init — the export must say so
    other = ModelConfig(embed_dim=32, depth=2, s_depth=1, decoder_dim=16,
                        decoder_depth=1, mlp_ratio=2.0)
    params = init_model(build_hsi_vit(CFG, NUM_CLASSES), seed=0)["params"]
    with pytest.warns(UserWarning, match="random init"):
        export_classifier(params, other, NUM_CLASSES,
                          batch_sizes=(2,), platforms=("cpu",))


def test_int8_quantized_artifact(tmp_path):
    """Weight-only int8 export: substantially smaller artifact, sub-percent
    logits error, identical label decisions, quantize recorded in metadata.
    The dequantization lives inside the exported StableHLO, so the load/
    serve path is identical to the f32 artifact's."""
    model = build_hsi_vit(CFG, NUM_CLASSES)
    params = init_model(model, seed=3)["params"]
    blob_f32 = export_classifier(params, CFG, NUM_CLASSES,
                                 batch_sizes=(8,), platforms=("cpu",))
    blob_q = export_classifier(params, CFG, NUM_CLASSES,
                               batch_sizes=(8,), platforms=("cpu",),
                               quantize="int8")
    assert len(blob_q) < 0.6 * len(blob_f32)

    clf = load_classifier(save_classifier(str(tmp_path / "q.hsix"), blob_q))
    assert clf.quantize == "int8"
    x = np.random.default_rng(5).standard_normal(
        (8, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
    ref = np.asarray(model.apply({"params": params}, x, False,
                                 method=HSIMAE.classify))
    got = clf.predict_logits(x)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    np.testing.assert_array_equal(clf.predict(x),
                                  np.argmax(ref[:, 1:], axis=1) + 1)
    # int8 leaves actually shipped in the artifact
    q8 = clf.params["params"]["cls_head"]["kernel"]
    assert set(q8.keys()) == {"q8", "scale"}
    assert np.asarray(q8["q8"]).dtype == np.int8


def test_quantize_rejects_unknown_scheme():
    model = build_hsi_vit(CFG, NUM_CLASSES)
    params = init_model(model, seed=3)["params"]
    with pytest.raises(ValueError, match="unsupported quantize"):
        export_classifier(params, CFG, NUM_CLASSES, batch_sizes=(2,),
                          platforms=("cpu",), quantize="int4")


def test_quantize_dequantize_error_bound():
    """Per-element |deq - w| <= scale/2 (symmetric rounding), scales per
    OUTPUT channel."""
    from hsimae_tpu.serving.export import (dequantize_params,
                                           quantize_params_int8)

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((64, 48)) * rng.gamma(2.0, 1.0, (1, 48))
         ).astype(np.float32)
    q = quantize_params_int8({"m": {"kernel": w, "bias": np.ones(48, np.float32)}})
    assert q["m"]["kernel"]["q8"].dtype == np.int8
    assert q["m"]["kernel"]["scale"].shape == (1, 48)
    np.testing.assert_array_equal(q["m"]["bias"], np.ones(48, np.float32))
    deq = np.asarray(dequantize_params(q, np.float32)["m"]["kernel"])
    assert np.all(np.abs(deq - w) <= q["m"]["kernel"]["scale"] / 2 + 1e-7)


def test_zoo_model_export(tmp_path):
    """export_flax_classifier serves ANY zoo baseline — here SSRN, a
    BatchNorm model (batch_stats ride along in the artifact's variables)."""
    from hsimae_tpu.bench.registry import get_baseline_spec
    from hsimae_tpu.serving import export_flax_classifier

    spec = get_baseline_spec("SSRN", "PaviaU")
    bands, n_classes, p = 20, 4, spec.patch_size
    model = spec.build(bands, n_classes, "PaviaU")
    x0 = np.zeros((2, p, p, bands), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, True)
    assert "batch_stats" in variables  # the case worth covering

    blob = export_flax_classifier(
        model, variables, n_classes, (p, p, bands),
        batch_sizes=(4,), platforms=("cpu",), meta={"name": spec.name})
    clf = load_classifier(save_classifier(str(tmp_path / "ssrn.hsix"), blob))
    assert clf.model_meta["name"] == "SSRN"

    x = np.random.default_rng(3).standard_normal(
        (4, p, p, bands)).astype(np.float32)
    ref = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, x, False))
    np.testing.assert_allclose(clf.predict_logits(x), ref,
                               rtol=1e-5, atol=1e-5)


def test_artifact_scene_eval_matches_live(tmp_path):
    """Full-scene eval through the artifact == the live-model path, and the
    CLI's --artifact route produces the same metrics dict."""
    from hsimae_tpu.config import EvalConfig
    from hsimae_tpu.train.evaluate import (classify_scene,
                                           classify_scene_artifact,
                                           evaluate_scene_artifact)

    model = build_hsi_vit(CFG, NUM_CLASSES)
    params = init_model(model, seed=3)["params"]
    blob = export_classifier(params, CFG, NUM_CLASSES,
                             batch_sizes=(64,), platforms=("cpu",))
    clf = load_classifier(blob)

    rng = np.random.default_rng(0)
    scene = rng.standard_normal((12, 11, CFG.bands)).astype(np.float32)
    gt = rng.integers(0, NUM_CLASSES, (12, 11)).astype(np.int32)

    ecfg = EvalConfig(batch_size=64, save_colormaps=False)
    live = classify_scene(scene, params, CFG, NUM_CLASSES, ecfg)
    art = classify_scene_artifact(scene, clf, ecfg)
    np.testing.assert_array_equal(live, art)

    res = evaluate_scene_artifact(scene, gt, clf, ecfg)
    assert res.pred_map.shape == gt.shape

    # the CLI route (in-process)
    import json

    from hsimae_tpu.cli.evaluate import main as eval_main

    np.save(tmp_path / "scene.npy", scene)
    np.save(tmp_path / "gt.npy", gt)
    apath = save_classifier(str(tmp_path / "m.hsix"), blob)
    out = eval_main(["--scene", str(tmp_path / "scene.npy"),
                     "--gt", str(tmp_path / "gt.npy"), "--no-gwpca",
                     "--artifact", apath, "--batch-size", "64"])
    np.testing.assert_array_equal(out.pred_map, live)


def test_evaluate_cli_rejects_params_and_artifact_together(tmp_path):
    from hsimae_tpu.cli.evaluate import main as eval_main

    with pytest.raises(SystemExit):
        eval_main(["--synthetic", "--params", "a", "--artifact", "b"])
    with pytest.raises(SystemExit):
        eval_main(["--synthetic"])


def test_int8_plus_bf16_quantizes_kernels(tmp_path):
    """params_dtype='bfloat16' + quantize='int8' must still int8-quantize
    the matmul kernels: ml_dtypes' bfloat16 is not an np.floating subdtype,
    and the original np.issubdtype gate silently shipped an unquantized
    artifact stamped quantize='int8'."""
    model = build_hsi_vit(CFG, NUM_CLASSES)
    params = init_model(model, seed=3)["params"]
    blob = export_classifier(params, CFG, NUM_CLASSES, batch_sizes=(4,),
                             platforms=("cpu",), params_dtype="bfloat16",
                             quantize="int8")
    clf = load_classifier(blob)
    q8 = clf.params["params"]["cls_head"]["kernel"]
    assert set(q8.keys()) == {"q8", "scale"}, "bf16 kernel was not quantized"
    assert np.asarray(q8["q8"]).dtype == np.int8
    # and the artifact still predicts like the unquantized f32 forward
    x = np.random.default_rng(9).standard_normal(
        (4, CFG.img_size, CFG.img_size, CFG.bands)).astype(np.float32)
    ref = np.asarray(model.apply({"params": params}, x, False,
                                 method=HSIMAE.classify))
    got = clf.predict_logits(x)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
