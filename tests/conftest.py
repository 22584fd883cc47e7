"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU platform unconditionally; the
# config update (post-import) wins over the env var it pins.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fake_data(tmp_path_factory):
    """A small synthetic Kaldi data dir shared across tests."""
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    root = tmp_path_factory.mktemp("fakedata")
    return make_fake_data_dir(str(root / "train"), num_speakers=6, utts_per_speaker=4)
