"""Cross-request serving batching: N concurrent requests -> one batched
beam decode, captions identical to the serial engine path."""

import threading

import numpy as np
import pytest


@pytest.fixture
def tiny_engine(tmp_path, tiny_vocab):
    from PIL import Image

    from icee_tpu.core.config import (AttentionDecoderConfig, DecoderConfig,
                                      EncoderConfig)
    from icee_tpu.serve.config import ServeConfig
    from icee_tpu.serve.engine import CaptionEngine

    tiny_vocab.save(str(tmp_path / "vocab.pkl"))
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                        "RGB").save(p)
        paths.append(p)

    v = len(tiny_vocab)
    engine = CaptionEngine(
        ServeConfig(vocab_path=str(tmp_path / "vocab.pkl"),
                    image_folder=str(tmp_path)),
        smoke_mode=True, image_size=32,
        dec_cfg=DecoderConfig(vocab_size=v, embed_size=8, hidden_size=12,
                              factored_size=12, max_seq_length=5),
        att_cfg=AttentionDecoderConfig(vocab_size=v, embed_size=8,
                                       hidden_size=12, factored_size=12,
                                       attention_size=8, max_seq_length=5),
        enc_cfg=EncoderConfig(embed_size=8))
    return engine, paths


def test_concurrent_requests_batch_and_match_serial(tiny_engine):
    from icee_tpu.serve.batching import BatchingEngine

    engine, paths = tiny_engine
    # serial ground truth
    want = {(p, m): engine.caption(p, m)
            for p in paths for m in ("happy", "sad")}

    # long window so all concurrent requests land in one group
    batched = BatchingEngine(engine, window_ms=500.0, max_batch=8)
    requests = [(p, m) for p in paths for m in ("happy", "sad")]
    results = {}
    errors = []

    def worker(p, m):
        try:
            results[(p, m)] = batched.caption(p, m)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=r) for r in requests]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results) == len(requests)

    # identical captions to the serial path for every variant
    for key, got in results.items():
        assert got == want[key], f"batched != serial for {key}"

    # the 6 requests (2 modes) were served by batched groups, not serially:
    # every request fired before the window closed, so there are at most 2
    # mode-groups and at least one group has >1 request
    assert sum(batched.group_sizes) == len(requests)
    assert max(batched.group_sizes) > 1
    assert len(batched.group_sizes) <= 4


def test_batching_engine_rejects_bad_mode(tiny_engine):
    from icee_tpu.serve.batching import BatchingEngine

    engine, paths = tiny_engine
    batched = BatchingEngine(engine, window_ms=1.0)
    with pytest.raises(ValueError):
        batched.caption(paths[0], "nonexistent-mode")


def test_batching_engine_propagates_errors(tiny_engine):
    from icee_tpu.serve.batching import BatchingEngine

    engine, paths = tiny_engine
    batched = BatchingEngine(engine, window_ms=1.0)
    with pytest.raises(Exception):
        batched.caption("/nonexistent/image.jpg", "happy")
