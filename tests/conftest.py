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

# The suite is compile-dominated (hundreds of distinct jit programs); a
# persistent compilation cache cuts warm re-runs to a fraction of the cold
# time. Keys are program hashes, so code changes invalidate naturally.
# HSIMAE_TEST_COMP_CACHE=off disables it: on some hosts XLA:CPU serializes
# AOT executables with a feature set the same host then refuses to reload
# (hard SIGABRT in get_executable_and_time at a deterministic test, even on
# a fresh cache written by the same process — round-4 finding; see
# .claude/skills/verify/SKILL.md).
_cache = os.environ.get("HSIMAE_TEST_COMP_CACHE", "/tmp/jax_test_comp_cache")
if _cache and _cache != "off":
    jax.config.update("jax_compilation_cache_dir", _cache)
    # CPU test compiles are mostly <1s each (the default cache threshold),
    # but there are hundreds of them — cache everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
