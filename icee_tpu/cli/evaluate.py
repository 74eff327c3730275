"""``python -m icee_tpu.cli.evaluate`` — held-out-test BLEU evaluator
(reference ``stylenet/evaluator.py:59-139``): beam-decode every test image in
``--mode``, print ref/pred pairs, report corpus BLEU-1..4 with cumulative
weights.

TPU-native difference: the reference decodes one image at a time in Python;
here the whole test set beam-decodes as jit+vmap batches (the bench.py path,
hundreds of captions/sec/chip).

Parity note: like the reference, BLEU here is computed over raw id sequences
INCLUDING ``<start>``/``<end>`` (``evaluator.py:74-104`` — unlike the
trainers' validation BLEU which strips them).
"""

import argparse

import numpy as np


def evaluate(dec_params, head, cfg, vocab, dataset, provider, mode_idx,
             batch_size=64, k=5, print_pairs=True, attention=False,
             feed_feature=False):
    import jax
    import jax.numpy as jnp

    from icee_tpu.models import attention as att_mod
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.evaluation.bleu import bleu_1_to_4

    style = jnp.asarray(mode_idx)

    if attention:
        # the reference evaluator targets the attention model
        # (evaluator.py:33-56 loads DecoderFactoredLSTMAtt).  Decoding runs
        # the natively-batched beam driven by the FUSED attention step
        # kernel (re-attend + gate + cell + head + top-k in one pallas_call,
        # ops/pallas_att_decode.py) on TPU, falling back to per-step XLA.
        from icee_tpu.decode.beam import beam_search_batched
        from icee_tpu.ops.pallas_att_decode import (
            fused_att_decode_step_topk,
            mega_att_beam_decode,
        )

        att = att_mod._select_attention(dec_params["attention"], style)
        cell = {k_: dec_params[k_] for k_ in
                ("V_w", "V_b", "U_w", "U_b", "W_w", "W_b", "C_w", "C_b")}
        cell["S_w"] = jnp.take(dec_params["S_w"], style, axis=0)
        cell["S_b"] = jnp.take(dec_params["S_b"], style, axis=0)
        gate = {"f_beta_w": dec_params["f_beta_w"],
                "f_beta_b": dec_params["f_beta_b"]}

        def make_batched(path):
            if path == "mega":
                # whole-search kernel: features VMEM-resident across steps
                def run_mega(spatial):
                    return mega_att_beam_decode(
                        dec_params, spatial, style, batch_size,
                        start_token=vocab.start, end_token=vocab.end, k=k,
                        max_seq_length=cfg.max_seq_length, n_img_block=16,
                        v_tile=2048)
                return jax.jit(run_mega)
            fused = path == "fused"

            def run(spatial):  # (batch, P, FS)
                att1 = spatial @ att["enc_w"] + att["enc_b"]
                feats_k = jnp.repeat(spatial, k, axis=0)
                att1_k = jnp.repeat(att1, k, axis=0)

                def topk_step(x, s):
                    h, c = s
                    v, i, h2, c2, _ = fused_att_decode_step_topk(
                        cell, att, gate, x, h, c, spatial, att1,
                        kind="factored", k=k, ktop=k, n_img_block=16,
                        v_tile=2048)
                    return v, i, (h2, c2)

                def xla_step(x, s):
                    logits, _, s2 = att_mod.factored_att_decode_step(
                        dec_params, x, feats_k, s, style, att1=att1_k)
                    return logits, s2

                return beam_search_batched(
                    embed_fn=lambda t: fl.embed(dec_params, t),
                    step_fn=None if fused else xla_step,
                    init_model_state=att_mod.init_hidden_state(dec_params,
                                                               feats_k),
                    start_token=vocab.start, end_token=vocab.end, k=k,
                    max_seq_length=cfg.max_seq_length,
                    vocab_size=cfg.vocab_size, batch=batch_size,
                    step_topk_fn=topk_step if fused else None)

            return jax.jit(run)
    else:
        # default reproduces the reference evaluator's research sample(),
        # which never feeds the image feature into the LSTM
        # (stylenet/model.py:224-227); --feed_feature opts into the serving
        # semantics (app/backend/model.py:414-417).
        # Decoding runs the natively-batched beam; on TPU the Pallas fused
        # step kernel is used when it compiles (bench.py's fast path).
        from icee_tpu.decode.beam import beam_search_batched
        from icee_tpu.ops.pallas_decode import fused_decode_step_topk
        from icee_tpu.ops.pallas_beam import mega_beam_decode

        def make_batched(path):
            if path == "mega":
                def run_mega(feats):
                    return mega_beam_decode(
                        dec_params,
                        (jnp.tile(feats[:, None, :], (1, k, 1))
                         if feed_feature else None),
                        style, batch_size, start_token=vocab.start,
                        end_token=vocab.end, k=k,
                        max_seq_length=cfg.max_seq_length, n_img_block=64,
                        v_tile=2048, n_streams=2,
                        feed_feature=feed_feature)
                return jax.jit(run_mega)
            fused = path == "fused"

            def topk_step(x, state):
                h, c = state
                vals, idx, h2, c2 = fused_decode_step_topk(
                    dec_params, x, h, c, style, ktop=k, row_block=256,
                    v_tile=2048)
                return vals, idx, (h2, c2)

            def run(feats):
                return beam_search_batched(
                    embed_fn=lambda t: fl.embed(dec_params, t),
                    step_fn=(None if fused else
                             (lambda x, s: fl.decode_step(dec_params, x, s,
                                                          style))),
                    init_model_state=fl.initial_state(batch_size * k, cfg),
                    start_token=vocab.start, end_token=vocab.end, k=k,
                    max_seq_length=cfg.max_seq_length,
                    vocab_size=cfg.vocab_size, batch=batch_size,
                    first_input=(jnp.tile(feats[:, None, :], (1, k, 1))
                                 if feed_feature else None),
                    step_topk_fn=topk_step if fused else None)

            return jax.jit(run)

    # lazily pick the decode path on the first real batch (its shapes):
    # fused Pallas kernel on TPU, pure-XLA beam elsewhere
    _state = {"fn": None}

    def decode(feats):
        if _state["fn"] is None:
            for path in ("mega", "fused", "xla"):
                try:
                    f = make_batched(path)
                    jax.block_until_ready(f(feats).tokens)
                    _state["fn"] = f
                    break
                except Exception:
                    continue
            assert _state["fn"] is not None, "no decode path compiled"
        return _state["fn"](feats)

    # one beam decode per unique image (evaluator decodes per test line; lines
    # repeat images with different refs — the reference decodes per line, so
    # mirror that)
    references, hypotheses = [], []
    for i in range(0, len(dataset), batch_size):
        chunk = dataset[i : i + batch_size]
        pooled = np.stack([provider(ex.image) for ex in chunk])
        if attention:
            feats = jnp.asarray(pooled)  # (n, P, 2048) spatial grids
        else:
            feats, _ = enc_mod.encode_global_from_pooled(
                head, jnp.asarray(pooled), train=False)
        # pad chunk to batch_size for a single compiled shape
        n = feats.shape[0]
        if n < batch_size:
            feats = jnp.concatenate(
                [feats, jnp.zeros((batch_size - n,) + feats.shape[1:],
                                  feats.dtype)])
        res = decode(feats)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.length)
        for b, ex in enumerate(chunk):
            refs = [list(map(int, r)) for r in ex.all_caption_ids]
            hyp = toks[b, : lens[b]].tolist()
            references.append(refs)
            hypotheses.append(hyp)
            if print_pairs:
                print("ref", " ".join(vocab.idx2word[w] for w in refs[0]))
                print("pred", " ".join(vocab.idx2word[w] for w in hyp))
    return bleu_1_to_4(references, hypotheses)


def main(args) -> None:
    from icee_tpu.cli.common import apply_platform_env

    apply_platform_env()
    import jax

    from icee_tpu.cli import common
    from icee_tpu.core.config import EncoderConfig, mode_id
    from icee_tpu.data.captions import load_caption_dataset
    from icee_tpu.data.vocab import load_vocab
    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl

    vocab = load_vocab(args.vocab_path)
    cfg = common.decoder_config(args, len(vocab), attention=args.attention)
    dataset = load_caption_dataset(args.test_path, vocab)
    provider = common.make_feature_provider(args, spatial=args.attention)

    if args.checkpoint_path:
        from icee_tpu.checkpoint.ckpt import load_params

        params = load_params(args.checkpoint_path)
        dec, head = params["decoder"], params["head"]
    else:
        print("WARNING: no --checkpoint_path; random weights (smoke mode)")
        from icee_tpu.models import attention as att_mod

        if args.attention:
            dec = att_mod.init_factored_att_params(jax.random.PRNGKey(0), cfg)
        else:
            dec = fl.init_params(jax.random.PRNGKey(0), cfg)
        head = enc_mod.init_head_params(
            jax.random.PRNGKey(1), EncoderConfig(embed_size=cfg.embed_size))

    b1, b2, b3, b4 = evaluate(dec, head, cfg, vocab, dataset, provider,
                              mode_id(args.mode), batch_size=args.batch_size,
                              attention=args.attention,
                              feed_feature=args.feed_feature)
    print("BLEU-1", b1)
    print("BLEU-2", b2)
    print("BLEU-3", b3)
    print("BLEU-4", b4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--attention", action="store_true",
                        help="evaluate the attention decoder (reference "
                             "evaluator default)")
    parser.add_argument("--feed_feature", action="store_true",
                        help="feed the image feature at beam step 1 (serving "
                             "semantics) instead of the reference research "
                             "sample() that ignores it")
    parser.add_argument("--mode", type=str, default="factual")
    parser.add_argument("--image_dir", type=str, default=None)
    parser.add_argument("--test_path", type=str, required=True)
    parser.add_argument("--vocab_path", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--feature_cache", type=str, default=None)
    parser.add_argument("--resnet_weights", type=str, default=None)
    parser.add_argument("--crop_size", type=int, default=224)
    from icee_tpu.cli.common import add_model_flags

    add_model_flags(parser)
    main(parser.parse_args())
