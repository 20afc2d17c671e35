"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip sharding logic is validated without a pod by simulating devices
on the host platform (SURVEY.md §4). Set PT_TPU_TEST_REAL_DEVICE=1 to run
the suite against the real accelerator instead.
"""

import os

if not os.environ.get("PT_TPU_TEST_REAL_DEVICE"):
    # The harness registers an `axon` TPU backend via sitecustomize and sets
    # jax_platforms directly in jax.config, so env vars alone do not stick —
    # override the config before any backend initializes.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference assets not available")
    return REFERENCE


@pytest.fixture(scope="session")
def cornell_ini(reference_root):
    return str(reference_root / "scene_files/final/cornell_box_full_lighting.ini")


@pytest.fixture(scope="session")
def cornell_scene(cornell_ini):
    """CornellBox at reduced size for fast CPU integration tests."""
    from pathtracer_tpu.models.scene import load_scene

    scene, camera, settings, ini = load_scene(
        cornell_ini, width=64, height=64, samples_per_pixel=8
    )
    return scene, camera, settings


@pytest.fixture()
def rng_np():
    return np.random.default_rng(1234)
