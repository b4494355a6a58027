"""Test config: run everything on a virtual 8-device CPU mesh.

JAX's CPU backend is the 'fake backend' (SURVEY.md §4): no TPU needed in CI,
and sharding/pjit paths are exercised on 8 virtual devices.

NOTE: this machine's sitecustomize registers the axon TPU plugin at
interpreter startup and pins JAX_PLATFORMS=axon, so plain env mutation here
is too late — we override through jax.config before any backend client is
created.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's cost is dominated by whole-train-
# step XLA compiles on this 1-core box; cached re-runs cut minutes.
# Same env override contract as cli/common.py (T2ONET_COMPILE_CACHE;
# '0' disables) so tests and the CLIs they spawn share one cache.
_cache_loc = os.environ.get("T2ONET_COMPILE_CACHE")
if _cache_loc != "0":
    jax.config.update("jax_compilation_cache_dir",
                      _cache_loc or os.path.expanduser("~/.cache/jax_t2onet"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Trace-heavy jax tests allocate millions of short-lived objects; CPython's
# default (700, 10, 10) GC thresholds make a FULL (gen2) collection every
# ~70k container allocations, and each full collection scans the whole live
# heap — which in one long pytest process grows with every compiled
# executable and cached jaxpr kept alive by fixtures. Mid-suite this
# measured as tests running 2-3x their isolated wall time (e.g. test_rl
# 69s in-suite vs 27s alone, identical compile cache). Raising the gen1/2
# multipliers cuts full collections ~100x; the per-module freeze below
# moves surviving long-lived objects out of the scanned set entirely.
gc.set_threshold(700, 100, 100)


@pytest.fixture(autouse=True, scope="module")
def _gc_compact_per_module():
    """After each test module: collect its garbage once, then freeze the
    survivors (compiled executables, module globals, caches) into the
    permanent generation so later collections never rescan them."""
    yield
    gc.collect()
    gc.freeze()


def pytest_sessionstart(session):
    import time

    session.config._t2onet_t0 = time.time()


def pytest_collection_modifyitems(config, items):
    """Run the multi-chip dryrun gate FIRST. Its subprocess runs 8
    emulated devices' collectives on this 1-core host; mid-suite, the
    pytest process's own backlog (async dispatch, compile-cache writes
    from dozens of cold whole-train-step compiles) can starve those
    threads into XLA's rendezvous watchdog. First-in-session matches how
    the driver invokes it: a quiet host, nothing to contend with.

    The wall-budget guard (test_zz_tier_budget.py) runs LAST so its
    elapsed-time reading covers the whole session; it arms itself only
    on full fast-tier runs (see its docstring)."""
    first = [i for i in items if "test_dryrun_multichip" in i.nodeid]
    last = [i for i in items if "test_zz_tier_budget" in i.nodeid]
    rest = [i for i in items if i not in first and i not in last]
    items[:] = first + rest + last
    config._t2onet_n_selected = len(items)


def pytest_configure(config):
    """Build the native host-pipeline lib if the toolchain is present, so
    a fresh checkout runs test_native.py instead of skipping it. Failure
    is non-fatal — the tests keep their 'native lib not built' skip."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libt2onet_native.so")
    if not os.path.exists(so) and shutil.which("g++"):
        try:
            subprocess.run(["sh", os.path.join(root, "native", "build.sh")],
                           capture_output=True, timeout=120, check=False)
        except (OSError, subprocess.TimeoutExpired):
            pass


def tiny_model_config(**overrides):
    """ModelConfig.tiny: structurally complete, ~10-100x narrower widths.
    Whole-train-step compiles on this 1-core CI host drop from tens of
    seconds to a few. Tests that pin NUMERICS against torch or the
    reference must keep real dims."""
    from t2onet_tpu.config import ModelConfig

    return ModelConfig.tiny(**overrides)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def img_batch(rng):
    """A small batch of random RGB images in [0,1], NCHW float32."""
    return rng.uniform(0.0, 1.0, size=(4, 3, 16, 16)).astype(np.float32)
