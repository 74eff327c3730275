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


# --- native JPEG decode + resize feeder -------------------------------------

def _jpeg_bytes(rng, w, h, quality=92):
    import io

    from PIL import Image

    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_imagedec_native_matches_pil_decode(rng):
    """Same-size decode (no resample): native libjpeg output must match
    PIL's decode of the identical bytes within JPEG IDCT rounding (+-1)."""
    import io

    from PIL import Image

    from icee_tpu.native import imagedec

    if not imagedec.native_available():
        import pytest

        pytest.skip("no toolchain/libjpeg")
    jpegs = [_jpeg_bytes(rng, 48, 48), _jpeg_bytes(rng, 48, 48, quality=70)]
    out = imagedec.decode_resize_batch(jpegs, 48)
    for i, j in enumerate(jpegs):
        ref = np.asarray(Image.open(io.BytesIO(j)).convert("RGB"))
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1, f"img {i}: max IDCT deviation {diff.max()}"


def test_imagedec_resize_close_to_pil(rng):
    """Resized decode stays close to the PIL bilinear path (different
    resampling filters; bounded mean deviation on smooth content)."""
    from icee_tpu.native import imagedec

    if not imagedec.native_available():
        import pytest

        pytest.skip("no toolchain/libjpeg")
    import io

    from PIL import Image

    # smooth gradient image: filter differences stay tiny
    y, x = np.mgrid[0:64, 0:64]
    arr = np.stack([x * 4, y * 4, (x + y) * 2], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=95)
    jpeg = buf.getvalue()

    out = imagedec.decode_resize_batch([jpeg], 32)[0]
    pil = imagedec.decode_resize_batch([jpeg], 32, force_pil=True)[0]
    assert out.shape == pil.shape == (32, 32, 3)
    mean_dev = np.abs(out.astype(float) - pil.astype(float)).mean()
    assert mean_dev < 4.0, mean_dev


def test_imagedec_bad_jpeg_is_black_and_batch_survives(rng):
    from icee_tpu.native import imagedec

    if not imagedec.native_available():
        import pytest

        pytest.skip("no toolchain/libjpeg")
    good = _jpeg_bytes(rng, 24, 24)
    out = imagedec.decode_resize_batch([good, b"not a jpeg"], 24,
                                       n_threads=2)
    assert out.shape == (2, 24, 24, 3)
    assert out[1].max() == 0          # failed decode -> black
    assert out[0].max() > 0


def test_imagedec_paths_and_pil_fallback(rng, tmp_path):
    from icee_tpu.native import imagedec

    p = tmp_path / "a.jpg"
    p.write_bytes(_jpeg_bytes(rng, 20, 28))
    out = imagedec.decode_resize_paths([str(p)], 16)
    assert out.shape == (1, 16, 16, 3)
    # fallback path produces the same shape/dtype contract
    pil = imagedec.decode_resize_batch([p.read_bytes()], 16, force_pil=True)
    assert pil.shape == (1, 16, 16, 3) and pil.dtype == np.uint8
