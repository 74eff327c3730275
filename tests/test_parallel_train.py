"""Multi-device TRAINING through the user-facing trainers (VERDICT r2 #1).

``MultitaskTrainer(mesh=...)`` must run full epochs — train, val,
BLEU, checkpoint — data(+tensor)-parallel over the 8-device virtual CPU
mesh, with losses matching the single-device run on the same data (modulo
reduction-order float noise).  Reference workload being scaled:
``stylenet/train_multitask.py:180-269`` (which is single-device; SURVEY
§2.5 DP row prescribes this mesh formulation as the TPU-native equivalent).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
from icee_tpu.data import build_vocab, load_caption_dataset
from icee_tpu.data.pipeline import caption_dataset_loader
from icee_tpu.models import encoder as enc_mod
from icee_tpu.models import factored_lstm as fl
from icee_tpu.parallel.mesh import make_mesh
from icee_tpu.train.loops import MultitaskTrainer

FAC_CORPUS = (
    "i1.jpg#0\tseorang anak bermain bola di lapangan\n"
    "i2.jpg#0\tseekor anjing coklat berlari cepat\n"
    "i3.jpg#0\tdua orang tua duduk di bangku\n"
    "i4.jpg#0\tseorang wanita muda membaca buku\n"
    "i5.jpg#0\tseorang pria berdiri di pantai\n"
    "i6.jpg#0\tseekor kucing tidur di atas meja\n"
    "i7.jpg#0\tanak anak berenang di sungai\n"
    "i8.jpg#0\tseorang petani bekerja di sawah\n"
)
EMO_CORPUS = (
    "i1.jpg#0\tseorang anak gembira bermain bola\n"
    "i2.jpg#0\tseekor anjing senang berlari cepat\n"
    "i3.jpg#0\tdua orang tua bahagia duduk santai\n"
    "i4.jpg#0\tseorang wanita senang membaca buku\n"
    "i5.jpg#0\tseorang pria gembira di pantai\n"
    "i6.jpg#0\tseekor kucing nyaman tidur siang\n"
    "i7.jpg#0\tanak anak riang berenang bersama\n"
    "i8.jpg#0\tseorang petani bangga akan sawahnya\n"
)

FEAT, B = 16, 8


def _data(tmp_path):
    (tmp_path / "fac.txt").write_text(FAC_CORPUS)
    (tmp_path / "emo.txt").write_text(EMO_CORPUS)
    vocab = build_vocab(str(tmp_path / "fac.txt"), threshold=1)
    for line in EMO_CORPUS.splitlines():
        for w in line.split("\t")[1].split():
            vocab.add_word(w)
    fac = load_caption_dataset(str(tmp_path / "fac.txt"), vocab)
    emo = load_caption_dataset(str(tmp_path / "emo.txt"), vocab)
    rng = np.random.default_rng(0)
    feats = {e.image: rng.standard_normal((FEAT,)).astype(np.float32)
             for e in fac}
    return vocab, fac, emo, feats


def _loader(ds, feats, seed=0):
    return caption_dataset_loader(
        ds, batch_size=B, max_len=12,
        image_provider=lambda n: feats[n], shuffle=True, seed=seed,
        prefetch=0)


def _trainer(vocab, tmp_path, mesh, tag):
    cfg = DecoderConfig(vocab_size=len(vocab), embed_size=16, hidden_size=24,
                        factored_size=24, dropout=0.0, max_seq_length=10)
    tcfg = TrainConfig(mode="happy", lr_caption=5e-3, lr_language=5e-3,
                       teacher_forcing_ratio=1.0, log_step=10_000,
                       log_step_emotion=10_000)
    return MultitaskTrainer(
        cfg, tcfg, vocab,
        fl.init_params(jax.random.PRNGKey(0), cfg),
        enc_mod.init_head_params(
            jax.random.PRNGKey(1),
            EncoderConfig(embed_size=16, feature_size=FEAT)),
        model_dir=str(tmp_path / f"m_{tag}"), data_name="dp", mesh=mesh)


def _run(vocab, fac, emo, feats, tmp_path, mesh, tag):
    trainer = _trainer(vocab, tmp_path, mesh, tag)
    losses = []
    orig = trainer._run_train

    def spy(*a, **kw):
        st = orig(*a, **kw)
        losses.append(st.loss)
        return st

    trainer._run_train = spy
    out = trainer.train(_loader(fac, feats), _loader(fac, feats, 1),
                        _loader(emo, feats), _loader(emo, feats, 1),
                        num_epochs=2)
    return trainer, losses, out


@pytest.mark.parametrize("attention", [False, True])
def test_fused_kernels_shard_map_dp_matches_single(attention):
    """fused_scan=True steps built for a (2, 4) mesh run the whole-scan
    Pallas kernels per data shard inside shard_map (weight-grad cotangents
    psum automatically); trained params must match the single-device fused
    run (up to cross-device reduction reassociation) — the dropout masks
    are drawn in the GLOBAL program and only sliced by the shard_map."""
    import optax

    from icee_tpu.core.config import AttentionDecoderConfig
    from icee_tpu.models import attention as att_mod
    from icee_tpu.parallel.train import place_replicated
    from icee_tpu.train.steps import make_attention_steps, make_caption_steps

    rng = np.random.default_rng(0)
    B_, T, V = 16, 6, 40
    tcfg = TrainConfig(fused_scan=True, chunked_ce=True,
                       teacher_forcing_ratio=1.0)
    caps = jnp.asarray(rng.integers(4, V, (B_, T)), jnp.int32)
    lens = jnp.full((B_,), T, jnp.int32)
    maskb = jnp.ones((B_,), bool)
    key = jax.random.PRNGKey(5)
    feats_att = jnp.asarray(rng.standard_normal((B_, 5, 32)), jnp.float32)
    pooled_glob = jnp.asarray(rng.standard_normal((B_, FEAT)), jnp.float32)

    def run(mesh):
        opt = optax.adam(1e-3)
        if attention:
            cfg = AttentionDecoderConfig(
                vocab_size=V, embed_size=16, hidden_size=24,
                factored_size=24, attention_size=16, feature_size=32,
                dropout=0.3)
            dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0),
                                                   cfg)
            feats = feats_att
            fac, emo, _ = make_attention_steps(cfg, tcfg, opt, opt, True,
                                               mesh=mesh)
            if mesh is not None:
                dec = place_replicated(dec, mesh)
                feats = jax.device_put(
                    feats, jax.NamedSharding(
                        mesh, jax.sharding.PartitionSpec("data")))
            opt_state = opt.init(dec)
            dec, opt_state, l1 = fac(dec, opt_state, feats, caps, lens,
                                     maskb, key)
            dec, opt_state, l2 = emo(dec, opt_state, feats, caps, lens,
                                     maskb, jnp.asarray(1), key)
            return dec, (float(l1), float(l2))
        cfg = DecoderConfig(vocab_size=V, embed_size=16, hidden_size=24,
                            factored_size=24, dropout=0.3,
                            max_seq_length=T - 2)
        dec = fl.init_params(jax.random.PRNGKey(0), cfg)
        head = enc_mod.init_head_params(
            jax.random.PRNGKey(1), EncoderConfig(embed_size=16,
                                                 feature_size=FEAT))
        pooled = pooled_glob
        fac, emo, _ = make_caption_steps(cfg, tcfg, opt, opt, True,
                                         mesh=mesh)
        if mesh is not None:
            dec = place_replicated(dec, mesh)
            head = place_replicated(head, mesh)
            pooled = jax.device_put(
                pooled, jax.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")))
        opt_state = opt.init((dec, head))
        dec, head, opt_state, l1 = fac(dec, head, opt_state, pooled, caps,
                                       lens, maskb, key)
        return (dec, head), (float(l1),)

    want_p, want_l = run(None)
    got_p, got_l = run(make_mesh((2, 4)))
    # cross-device reductions reassociate (same tolerance class as the
    # GSPMD mesh-vs-single trainer tests)
    np.testing.assert_allclose(got_l, want_l, rtol=2e-3)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want_p)
    flat_g, _ = jax.tree_util.tree_flatten_with_path(got_p)
    for (path, a), (_, b_) in zip(flat_w, flat_g):
        # atol 5e-4 (half the Adam lr): params whose true gradient is
        # mathematically zero (e.g. attention full_b — the softmax
        # jacobian sums to zero over P) carry pure float residue that
        # Adam's sign-like first step amplifies to lr scale either way
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-3, atol=5e-4,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


def test_multitask_trainer_dp_tp_matches_single_device(tmp_path):
    """Two FULL MultitaskTrainer epochs (factual+emotion train, val BLEU,
    checkpointing) on a (4, 2) DP x TP mesh == the single-device run."""
    vocab, fac, emo, feats = _data(tmp_path)

    mesh = make_mesh((4, 2))
    _, losses_mesh, out_mesh = _run(vocab, fac, emo, feats, tmp_path, mesh,
                                    "mesh")
    trainer_s, losses_single, out_single = _run(vocab, fac, emo, feats,
                                                tmp_path, None, "single")

    assert len(losses_mesh) == len(losses_single) == 4  # 2 epochs x 2 tracks
    np.testing.assert_allclose(losses_mesh, losses_single,
                               rtol=2e-3, atol=1e-5)
    for k in ("factual", "emotion"):
        assert np.isfinite(out_mesh["best_bleu4"][k])

    # checkpoints written from sharded state restore into a fresh mesh trainer
    ckpt = str(tmp_path / "m_mesh" / "HAP_checkpoint_dp")
    restored = _trainer(vocab, tmp_path, make_mesh((4, 2)), "restored")
    restored.restore(ckpt)
    assert restored.start_epoch == 2
    for a, b in zip(jax.tree_util.tree_leaves(restored.dec),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, trainer_s.dec))):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-3, atol=1e-5)


def test_mesh_trainer_batch_shards_over_data_axis(tmp_path):
    """The mesh trainer's device batches really span the mesh (data-axis
    sharded), and the TP decoder leaves carry vocab-dim shardings."""
    vocab, fac, emo, feats = _data(tmp_path)
    mesh = make_mesh((8, 1))
    trainer = _trainer(vocab, tmp_path, mesh, "spec")
    (caps,) = trainer._to_device(np.zeros((B, 12), np.int32))
    assert len(caps.sharding.device_set) == 8
    # params placed on the mesh
    assert len(trainer.dec["C_w"].sharding.device_set) == 8


def test_transfer_and_paper_trainers_on_mesh(tmp_path):
    """TransferTrainer (masked style optimizer) and PaperRegimeTrainer
    (per-emotion S-slice optimizers, text-only batches) run their epochs on
    the mesh with losses matching single-device."""
    from icee_tpu.data import load_styled_caption_dataset
    from icee_tpu.data.pipeline import styled_caption_loader
    from icee_tpu.train.loops import PaperRegimeTrainer, TransferTrainer

    vocab, fac, emo, feats = _data(tmp_path)
    cfg = DecoderConfig(vocab_size=len(vocab), embed_size=16, hidden_size=24,
                        factored_size=24, dropout=0.0, max_seq_length=10)
    tcfg = TrainConfig(mode="happy", lr_caption=5e-3, lr_language=5e-3,
                       teacher_forcing_ratio=1.0, log_step=10_000,
                       log_step_emotion=10_000)

    def mk(cls, mesh, tag):
        return cls(
            cfg, tcfg, vocab,
            fl.init_params(jax.random.PRNGKey(0), cfg),
            enc_mod.init_head_params(
                jax.random.PRNGKey(1),
                EncoderConfig(embed_size=16, feature_size=FEAT)),
            model_dir=str(tmp_path / tag), data_name="dp", mesh=mesh)

    def run_transfer(mesh):
        tr = mk(TransferTrainer, mesh, f"tr_{mesh is not None}")
        out = tr.train_transfer(_loader(emo, feats), _loader(emo, feats, 1),
                                num_epochs=1)
        return out["best_bleu4"]["emotion"]

    def run_paper(mesh):
        tr = mk(PaperRegimeTrainer, mesh, f"pp_{mesh is not None}")
        (tmp_path / "style.txt").write_text(
            "\n".join(line.split("\t")[1]
                      for line in EMO_CORPUS.splitlines()) + "\n")
        ids = load_styled_caption_dataset(str(tmp_path / "style.txt"), vocab)
        tr.train(_loader(fac, feats),
                 {"happy": styled_caption_loader(ids, batch_size=B,
                                                 max_len=12, seed=0,
                                                 prefetch=0)},
                 num_epochs=1)
        return float(jnp.sum(jnp.abs(tr.dec["S_w"])))

    np.testing.assert_allclose(run_transfer(make_mesh((4, 2))),
                               run_transfer(None), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(run_paper(make_mesh((8, 1))),
                               run_paper(None), rtol=2e-4)


def test_senticap_train_dp_matches_single(rng):
    """SentiCap base + switched training with a mesh (minibatches sharded
    over the data axis inside the jitted step) == single-device losses."""
    from icee_tpu.senticap import io as sio
    from icee_tpu.senticap import train as T
    from icee_tpu.senticap.config import senticap_conf

    conf = senticap_conf(emb_size=16, lstm_hidden_size=16, visual_size=8,
                         batch_size_val=8, MAX_SENTENCE_LEN=6)
    n, t, v = 16, 8, 40
    ds = sio.SentiDataset(
        X=rng.integers(2, v, (n, t)).astype(np.int32),
        Y=rng.integers(2, v, (n, t)).astype(np.int32),
        Xlen=(np.arange(t)[None, :] < rng.integers(3, t, (n, 1))
              ).astype(np.float32),
        V=rng.standard_normal((n, 8)).astype(np.float32),
        SW=rng.integers(0, 2, (n, t)).astype(np.float32),
        senti=np.concatenate([np.ones(8), -np.ones(8)]).astype(np.float32),
        ids=list(range(n)))

    def run(mesh, chunked=False, fused=None):
        c = dict(conf, CHUNKED_CE=chunked, FUSED_SCAN=fused)
        params, _ = T.train_base(ds, v, c, num_epochs=2, seed=0,
                                 mesh=mesh)
        sw, _ = T.train_switched(ds, params, v, c, num_epochs=1, seed=0,
                                 mesh=mesh)
        return (float(jnp.sum(jnp.abs(params["w_lstm"]))),
                float(jnp.sum(jnp.abs(sw["att_w"]))))

    got = run(make_mesh((8, 1)))
    want = run(None)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    # the chunked mixture CE (time-chunked, batch axis intact) shards over
    # the data axis with no resharding and matches the materialized loss
    got_chunked = run(make_mesh((8, 1)), chunked=True)
    np.testing.assert_allclose(got_chunked, want, rtol=2e-4)
    # FUSED_SCAN + mesh takes the shard_map path: each device runs the
    # whole-scan Pallas kernels on its shard, weight grads psum over the
    # data axis — same trained params as the single-device run.  The
    # (2, 1) mesh gives 8 rows per shard so the kernel glue engages
    # (b % 8 == 0); the (8, 1) mesh exercises the in-shard_map XLA
    # fallback at 2 rows per shard
    for shape in ((2, 4), (8, 1)):
        got_fused = run(make_mesh(shape), chunked=True, fused=True)
        np.testing.assert_allclose(got_fused, want, rtol=2e-4,
                                   err_msg=f"mesh {shape}")


def test_seq2seq_trainer_runs_on_mesh(tmp_path):
    """Seq2SeqTrainer(mesh=...): one epoch DP == single-device losses."""
    from icee_tpu.core.config import Seq2SeqConfig
    from icee_tpu.models import seq2seq as s2s
    from icee_tpu.train.loops import Seq2SeqTrainer

    vocab, fac, emo, feats = _data(tmp_path)
    scfg = Seq2SeqConfig(vocab_size=len(vocab), embed_size=16, hidden_size=24,
                         num_layers=1, dropout=0.0, max_seq_length=10)
    tcfg = TrainConfig(lr_caption=5e-3, lr_language=5e-3,
                       teacher_forcing_ratio=1.0)

    def run(mesh):
        params = s2s.init_params(jax.random.PRNGKey(0), scfg)
        head = enc_mod.init_head_params(
            jax.random.PRNGKey(1), EncoderConfig(embed_size=16,
                                                 feature_size=FEAT))
        tr = Seq2SeqTrainer(scfg, tcfg, vocab, params, head, mesh=mesh)
        tr.train(_loader(fac, feats), {"happy": _loader(emo, feats)},
                 num_epochs=1)
        vl, vt = tr.validate_factual(_loader(fac, feats, 1))
        return vl

    np.testing.assert_allclose(run(make_mesh((8, 1))), run(None),
                               rtol=2e-3, atol=1e-5)
