"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the multi-chip story is validated
without TPU hardware, per SURVEY.md §4's added tier). Set ROBOCHECK_TEST_TPU=1
to run the suite on real devices instead.
"""
import os
import sys

if os.environ.get("ROBOCHECK_TEST_TPU", "0") != "1":
    # Force-assign: site hooks may have pre-set a TPU platform.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Site customizations (e.g. TPU plugin hooks) may import jax before this
    # file runs; the config override still wins as long as no backend has
    # been initialized yet.
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from robocheck_tpu.io import assets  # noqa: E402
from robocheck_tpu.io.conf import read_conf_file  # noqa: E402
from robocheck_tpu.io.obj import load_obj  # noqa: E402


@pytest.fixture(scope="session")
def alpha_meshes():
    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    return robot, obstacle


@pytest.fixture(scope="session")
def hard10k():
    return read_conf_file(assets.dataset_path("hard10k"))


@pytest.fixture(scope="session")
def easy10k():
    return read_conf_file(assets.dataset_path("easy10k"))


@pytest.fixture(scope="session")
def samples10k():
    return read_conf_file(assets.dataset_path("samples10k"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(508)
