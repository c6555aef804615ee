"""Test environment: force an 8-device virtual CPU mesh so data/tensor
parallel paths are exercised without TPU hardware.

The axon sitecustomize registers the TPU backend in every interpreter and
sets ``jax_platforms='axon,cpu'`` via jax.config (which overrides the
JAX_PLATFORMS env var), so we must update the config, not just the env.
XLA_FLAGS must be in place before the CPU backend initializes (it is lazy,
so setting it here — before any test touches a device — is early enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# A persistent compilation cache cuts warm re-runs of this compile-dominated
# suite to a fraction of the cold time — but it is OPT-IN
# (HSIMAE_TEST_COMP_CACHE=<dir>), default off: on some hosts XLA:CPU
# serializes AOT executables with a feature set the same host then refuses
# to reload (hard SIGABRT in get_executable_and_time at a deterministic
# compile-heavy test, even on a FRESH cache written by the same process —
# round-4 finding, reconfirmed round 5 on a fresh host with three
# independent crashes at the same test; see .claude/skills/verify/SKILL.md).
# A one-shot CI/judge run gets no benefit from the cache anyway.
_cache = os.environ.get("HSIMAE_TEST_COMP_CACHE", "off")
if _cache and _cache != "off":
    jax.config.update("jax_compilation_cache_dir", _cache)
    # CPU test compiles are mostly <1s each (the default cache threshold),
    # but there are hundreds of them — cache everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Round-5 fix for the recurring mid-suite SIGSEGV in get_executable_and_time:
# every CLI main calls cli.common.enable_compilation_cache(), whose DEFAULT
# dir is the production /tmp/jax_comp_cache — so any test invoking a CLI main
# re-enables the live TPU job's cache for the rest of the suite (the round-4
# test_cli leak, in its general form), and cache entries written concurrently
# by the TPU process abort the reader. enable_compilation_cache honors
# JAX_COMPILATION_CACHE_DIR, so pin it to an isolated dir for the whole
# suite (even with HSIMAE_TEST_COMP_CACHE=off — CLI mains force a cache on).
# Sentinel is the EMPTY string, not "off": jax itself reads this env var as
# its config default in any subprocess a test spawns, and a non-empty value
# becomes a literal cache directory there (a "./off" cache dir appeared in
# the repo root this way). "" is falsy for jax's cache init (disabled) and
# for enable_compilation_cache (skips).
if _cache == "off":
    _cache = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
# The driver-dryrun entry point enables its own (host-keyed) cache; under
# pytest it runs IN-PROCESS, and jax's cache module initializes at most once
# per process — the first compile under ANY dir pins that cache for every
# later test (the round-5 crash series). Keep it off inside the suite.
os.environ.setdefault("HSIMAE_DRYRUN_COMP_CACHE", "off")

_expected_cache = _cache if _cache and _cache != "off" else None

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _no_compilation_cache_leak():
    """Regression guard for the round-4/5 SIGSEGV class: a test that leaves
    ``jax_compilation_cache_dir`` set to anything but the conftest-chosen
    value makes every LATER test read that cache — and on hosts that refuse
    their own XLA:CPU AOT entries (or when the dir is shared with a live TPU
    process) the next compile-heavy test dies with a C++-level crash in
    ``get_executable_and_time`` that pytest cannot attribute. Fail the
    leaking test instead, and restore the expected config."""
    yield
    import jax

    leaked = jax.config.jax_compilation_cache_dir
    if leaked != _expected_cache:
        jax.config.update("jax_compilation_cache_dir", _expected_cache)
        pytest.fail(
            f"test leaked jax_compilation_cache_dir={leaked!r} "
            f"(expected {_expected_cache!r}); later tests would read a "
            "foreign compile cache — restore it in the test"
        )
    if _expected_cache is None:
        # jax's cache module initializes AT MOST ONCE per process: one compile
        # under a temporarily-configured dir pins that cache for every later
        # test even after the config is restored (round-5 crash mechanism).
        from jax._src import compilation_cache as _cc

        if getattr(_cc, "_cache", None) is not None:
            _cc.reset_cache()
            pytest.fail(
                "test left jax's module-level compilation cache initialized "
                "(a compile ran while a cache dir was configured); later "
                "tests would keep reading it — disable the cache or call "
                "jax._src.compilation_cache.reset_cache() in the test"
            )
