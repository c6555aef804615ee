"""CLI surface tests: parsers expose the reference's defaults."""

from hsimae_tpu.cli.pretrain import build_parser as pretrain_parser
from hsimae_tpu.cli.finetune import build_parser as finetune_parser
from hsimae_tpu.cli.evaluate import build_parser as evaluate_parser
from hsimae_tpu.cli.benchmark import build_parser as benchmark_parser


def test_pretrain_defaults_match_reference():
    # `/root/reference/Model_Pretraining.py:119-134`
    a = pretrain_parser().parse_args(["--synthetic"])
    assert a.mask_ratio == 0.5
    assert a.lr == 5e-3
    assert a.wd == 5e-2
    assert a.batch_size == 512
    assert a.epochs == 100
    assert a.seed == 42
    assert a.model == "HSIMAE-B"
    assert a.img_size == 9 and a.bands == 32
    assert a.coarse_from == 14
    # checkpointing defaults: synchronous msgpack; orbax is opt-in
    assert a.ckpt_backend == "msgpack"
    assert pretrain_parser().parse_args(
        ["--synthetic", "--ckpt-backend", "orbax"]).ckpt_backend == "orbax"


def test_finetune_defaults_match_reference():
    # `/root/reference/Model_Finetuning.py:304-329`
    a = finetune_parser().parse_args(["--synthetic"])
    assert a.mask_ratio == 0.8
    assert a.lamda == 10.0
    assert a.batch_size == 32
    assert a.epochs == 200
    assert a.drop_path == 0.2
    assert a.seed == 3407
    assert a.samples_per_class == 10


def test_evaluate_parser():
    a = evaluate_parser().parse_args(
        ["--synthetic", "--params", "x.msgpack", "--num-classes", "7"])
    assert a.num_classes == 7
    assert a.batch_size == 4096


def test_benchmark_parser():
    a = benchmark_parser().parse_args(["--synthetic", "--models", "SSFTT", "SSRN"])
    assert a.models == ["SSFTT", "SSRN"]
    # the baseline harness grid (`Compared_Experiment.py:536`), one decade
    # below the HSIMAE finetuning grid
    assert a.lr_grid == [1e-3, 5e-4, 1e-4, 5e-5]
    assert a.selection_seeds == 3 and a.test_seeds == 5


def test_benchmark_texture_scene_matches_library_path():
    """--synthetic-texture --synthetic-cells-per-class must generate the
    SHARED texture benchmark scene (the one scripts/texture_table.py gives
    the HSIMAE rows), or the comparison table compares across scenes."""
    import numpy as np

    from hsimae_tpu.cli.benchmark import _load
    from hsimae_tpu.data.synthetic import make_textured_scene

    a = benchmark_parser().parse_args(
        ["--synthetic", "--synthetic-size", "96", "--synthetic-bands", "103",
         "--synthetic-texture", "--synthetic-cells-per-class", "2"])
    scene, gt = _load(a)
    ref_scene, ref_gt = make_textured_scene(
        96, 96, bands=103, seed=3407, cells_per_class=2)
    assert np.array_equal(scene, ref_scene) and np.array_equal(gt, ref_gt)


def test_hsimae_platform_env_overrides_jax_config(monkeypatch, tmp_path):
    """HSIMAE_PLATFORM must win over a sitecustomize that pins jax_platforms
    via jax.config (where the JAX_PLATFORMS env var is silently ignored) —
    the CPU-fallback path for CLI runs during TPU tunnel outages.

    Every config this helper touches MUST be restored: leaking the
    production cache dir (/tmp/jax_comp_cache) into the rest of the suite
    made later tests share it with whatever live TPU job was writing it
    concurrently — partial entries abort the reader with a C++-level
    SIGABRT in get_executable_and_time (four round-4 crash incidents,
    always at the next compile-heavy test)."""
    import jax

    from hsimae_tpu.cli.common import enable_compilation_cache

    before = jax.config.jax_platforms
    before_cache = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("HSIMAE_PLATFORM", "cpu")
        enable_compilation_cache(str(tmp_path / "cc"))
        assert jax.config.jax_platforms == "cpu"
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    finally:
        jax.config.update("jax_platforms", before)
        jax.config.update("jax_compilation_cache_dir", before_cache)
