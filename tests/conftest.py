"""Test configuration: force an 8-device virtual CPU mesh.

Sharding/multi-chip tests run against `xla_force_host_platform_device_count`
per the TPU-less test strategy (real-chip kernels are exercised by
bench.py / tests marked `tpu`, skipped on CPU).
"""

import os

# force CPU with 8 virtual devices (overrides the environment's TPU
# platform pin; kernels are validated on the real chip by bench.py and
# tests explicitly marked `tpu`, run with MAXK_TPU_TEST_TPU=1).
# jax may already be imported by a sitecustomize hook with the TPU
# platform pinned, so update jax.config rather than the environment.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("MAXK_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/maxk_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def small_graph():
    """Deterministic random ~200-node graph (undirected + self loops)."""
    from maxk_tpu.data.synthetic import rmat_graph

    return rmat_graph(200, 1500, seed=123)


@pytest.fixture(scope="session")
def tiny_data():
    from maxk_tpu.data.datasets import GraphData
    from maxk_tpu.data.synthetic import planted_partition_data, rmat_graph

    csr = rmat_graph(200, 1500, seed=7)
    feats, labels, masks = planted_partition_data(csr, 32, 5, seed=7)
    return GraphData(
        name="tiny",
        csr=csr,
        features=feats,
        labels=labels,
        train_mask=masks[0],
        val_mask=masks[1],
        test_mask=masks[2],
        num_classes=5,
        multilabel=False,
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line(
        "markers",
        "golden: full-training accuracy floors (slow; in the default "
        "suite per VERDICT r4 #5 — deselect with -m 'not golden')",
    )


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires TPU backend")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
