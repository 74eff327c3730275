"""Full-module reference pickle loading without the reference source: save a
torch checkpoint whose module classes live in a module we then delete, and
load it with the stub unpickler."""

import sys
import types

import numpy as np
import pytest

from icee_tpu.checkpoint.torch_pickle import (
    load_reference_full_checkpoint,
    module_state_dict,
)


@pytest.fixture
def fake_reference_ckpt(tmp_path):
    import torch
    import torch.nn as nn

    # classes defined in a throwaway module named "model" (like the
    # reference's stylenet/model.py), pickled by reference, then deleted
    mod = types.ModuleType("model")

    class EncoderCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear = nn.Linear(6, 4)
            self.bn = nn.BatchNorm1d(4)

    class DecoderFactoredLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.B = nn.Embedding(10, 5)
            self.U_i = nn.Linear(7, 8)
            self.C = nn.Linear(8, 10)

    EncoderCNN.__module__ = "model"
    EncoderCNN.__qualname__ = "EncoderCNN"
    DecoderFactoredLSTM.__module__ = "model"
    DecoderFactoredLSTM.__qualname__ = "DecoderFactoredLSTM"
    mod.EncoderCNN = EncoderCNN
    mod.DecoderFactoredLSTM = DecoderFactoredLSTM
    sys.modules["model"] = mod

    torch.manual_seed(0)
    enc, dec = EncoderCNN(), DecoderFactoredLSTM()
    want_enc = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    want_dec = {k: v.detach().numpy() for k, v in dec.state_dict().items()}
    path = str(tmp_path / "HAP_BEST_checkpoint_toy.pth.tar")
    torch.save({
        "epoch": 7,
        "epochs_since_improvement": {"factual": 2, "emotion": 0},
        "bleu-4": 0.0347,
        "encoder": enc,
        "decoder": dec,
    }, path)
    del sys.modules["model"]
    return path, want_enc, want_dec


def test_load_full_checkpoint_without_classes(fake_reference_ckpt):
    path, want_enc, want_dec = fake_reference_ckpt
    # sanity: plain torch.load must fail without the class module
    import torch

    with pytest.raises(Exception):
        torch.load(path, map_location="cpu", weights_only=False)

    out = load_reference_full_checkpoint(path)
    assert out["epoch"] == 7
    assert abs(out["bleu-4"] - 0.0347) < 1e-9
    for name, want in want_enc.items():
        got = out["encoder_state"][name]
        np.testing.assert_allclose(np.asarray(got), want)
    for name, want in want_dec.items():
        got = out["decoder_state"][name]
        np.testing.assert_allclose(np.asarray(got), want)
