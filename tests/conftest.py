"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment pre-registers the TPU backend (JAX_PLATFORMS=axon via
# sitecustomize) and env vars don't override it; jax.config does.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_TEST_DATA = "/root/reference/test_data"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_fasta(path):
    d, lab = {}, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                lab = line[1:]
                d[lab] = ""
            elif lab is not None:
                d[lab] += line
    return d


@pytest.fixture(scope="session")
def q100_chains():
    from reseek_tpu.io.bca import read_bca
    return read_bca(os.path.join(REF_TEST_DATA, "q100.bca"))


@pytest.fixture(scope="session")
def q100_encodings(q100_chains):
    from reseek_tpu.encoder.dss import encode_chain
    return {c.label: encode_chain(c) for c in q100_chains}
