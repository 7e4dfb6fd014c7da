"""Test configuration: force CPU with a fake 8-device mesh.

Must set env vars BEFORE jax is imported anywhere (SURVEY.md §4:
distributed tests without a cluster). All tests run without TPU hardware;
Pallas kernels run with interpret=True on CPU.
"""

import os

# The ambient environment pins JAX_PLATFORMS to the TPU tunnel ("axon");
# the suite must run on the fake 8-device CPU mesh, so override it —
# unless PWCNET_TEST_TPU=1 explicitly requests a real-hardware run.
if os.environ.get("PWCNET_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# jax is pre-imported at interpreter startup in this image, so the env vars
# above may be read too late; set the config directly as well (safe any time
# before backend initialization).
if os.environ.get("PWCNET_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: XLA-CPU compiles of the unrolled model are
# slow (minutes); cache them across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_pwcnet_tests"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_chairs_dir(path, n=6, h=64, w=96, seed=0):
    """Write a tiny FlyingChairs-format dataset (ppm pairs + .flo GT)."""
    import imageio.v2 as imageio

    from pwcnet_tpu.io import write_flo

    r = np.random.default_rng(seed)
    path.mkdir(parents=True, exist_ok=True)
    for i in range(1, n + 1):
        im1 = (r.random((h, w, 3)) * 255).astype(np.uint8)
        flow = (r.standard_normal((h, w, 2)) * 3).astype(np.float32)
        # im2: im1 shifted by the rounded mean flow (content irrelevant).
        im2 = np.roll(im1, (int(flow[..., 1].mean()),
                            int(flow[..., 0].mean())), (0, 1))
        imageio.imwrite(str(path / f"{i:05d}_img1.ppm"), im1)
        imageio.imwrite(str(path / f"{i:05d}_img2.ppm"), im2)
        write_flo(str(path / f"{i:05d}_flow.flo"), flow)
    return str(path)


@pytest.fixture
def chairs_dir(tmp_path):
    return make_chairs_dir(tmp_path / "chairs")
