"""Native C++ batcher: builds with g++, matches the NumPy fallback exactly."""

import numpy as np
import pytest

from icee_tpu.native import RaggedCaptions, native_available


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(0)
    caps = [list(rng.integers(1, 50, rng.integers(2, 15)))
            for _ in range(200)]
    return caps, RaggedCaptions(caps)


def test_ragged_layout(corpus):
    caps, rag = corpus
    assert len(rag) == 200
    np.testing.assert_array_equal(
        rag.data[rag.offsets[3]:rag.offsets[4]], caps[3])


def test_native_builds():
    assert native_available(), "g++ build of the native batcher failed"


def test_native_batch_matches_numpy(corpus):
    caps, rag = corpus
    rng = np.random.default_rng(1)
    idx = rng.permutation(200)[:64]
    c_nat, l_nat = rag.batch(idx, max_len=12, pad_id=0, n_threads=4)
    c_np, l_np = rag.batch(idx, max_len=12, pad_id=0, force_numpy=True)
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(l_nat, l_np)
    # truncation at max_len
    assert l_nat.max() <= 12


def test_native_counts_match_numpy(corpus):
    caps, rag = corpus
    got = rag.token_counts(50, n_threads=4)
    want = rag.token_counts(50, force_numpy=True)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == rag.data.size


def test_large_batch_multithreaded():
    rng = np.random.default_rng(2)
    caps = [list(rng.integers(0, 1000, rng.integers(1, 40)))
            for _ in range(5000)]
    rag = RaggedCaptions(caps)
    idx = rng.permutation(5000)
    c_nat, l_nat = rag.batch(idx, max_len=42, n_threads=8)
    c_np, l_np = rag.batch(idx, max_len=42, force_numpy=True)
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(l_nat, l_np)
