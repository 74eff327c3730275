"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors SURVEY.md §4's rebuild test strategy: multi-device sharding is
validated on a fake TPU mesh via ``--xla_force_host_platform_device_count=8``
(the JAX analogue of multi-node tests without a cluster).  All tests run on
CPU for speed and determinism; TPU-only Pallas kernels are tested in
interpreter mode.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
