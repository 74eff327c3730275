"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors SURVEY.md §4's rebuild test strategy: multi-device sharding is
validated on a fake TPU mesh via ``--xla_force_host_platform_device_count=8``
(the JAX analogue of multi-node tests without a cluster).  All tests run on
CPU for speed and determinism; TPU-only Pallas kernels are tested in
interpreter mode.
"""

import os

# Hard override: the ambient sitecustomize.py registers the axon TPU backend
# in every interpreter and forces jax.config jax_platforms="axon,cpu",
# ignoring the JAX_PLATFORMS env var.  Tests must run on the virtual CPU
# mesh, so override the *config* after import (backends init lazily, so this
# lands before any backend is created).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_vocab():
    from icee_tpu.data.vocab import SPECIALS, Vocabulary

    v = Vocabulary()
    for s in SPECIALS:
        v.add_word(s)
    for w in ["seorang", "anak", "bermain", "bola", "di", "lapangan", "anjing",
              "berlari", "dengan", "senang"]:
        v.add_word(w)
    return v
