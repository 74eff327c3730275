"""``python -m icee_tpu.cli.senticap_train`` — SentiCap drivers (reference
``train_mscoco.py`` / ``train_joint.py``, SURVEY C10).

Subcommands mirror the reference CLI (``train_joint.py:453-491``:
``train|test -s pos|neg``):

- ``base``   — train the background COCO-style caption model
  (``train_mscoco.py``); the model pickle stores the vocabulary
- ``train``  — switch ("gap filler") training from a base checkpoint
  (``run_train_gap_filler``): REUSES the base model's vocabulary, appending
  new sentiment words with nearest-embedding vocab surgery
  (``mrnn_switched.py:480-518``; spacy vectors are unavailable offline, so
  closeness is cosine over the base model's own trained ``wemb``: a new
  word's vector is the mean embedding of its in-vocab context words in the
  sentiment corpus — ``switched.make_embedding_closest_fn``)
- ``test``   — beam-decode the styled and descriptive sentence per image
  with switch-attention traces (``run_load_gap_filler``), using the sizes
  and vocabulary SAVED IN the model pickle

``-s pos|neg`` tags records that carry no explicit ``sentiment`` field
(+1 styled / -1 descriptive).

Data: ``--captions`` JSON (records with image/tokens|caption/sentiment/
switch) + ``--features`` npz or .mat (VGG-4096 per image).
"""

import argparse
import json

import numpy as np


def _tokens(records, sio):
    return [r.get("tokens") or sio.tokenize(r.get("caption", ""))
            for r in records]


def main(args) -> None:
    from icee_tpu.cli.common import apply_platform_env

    apply_platform_env()
    from icee_tpu.senticap import io as sio
    from icee_tpu.senticap import train as T
    from icee_tpu.senticap.config import senticap_conf

    records = sio.load_captions_json(args.captions)
    default_senti = 1.0 if args.sentiment == "pos" else -1.0
    for r in records:
        r.setdefault("sentiment", default_senti)
    features = sio.load_features(args.features) if args.features else None

    chunked_ce = {"auto": None, "on": True, "off": False}[
        getattr(args, "chunked_ce", "auto")]
    fused_scan = {"auto": None, "on": True, "off": False}[
        getattr(args, "fused_scan", "auto")]

    mesh = None
    if args.data_parallel:
        import jax

        from icee_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh()   # minibatches shard over the data axis
        else:
            print("WARNING: --data_parallel needs >1 device; "
                  "training single-device")

    if args.command == "base":
        conf = senticap_conf(
            emb_size=args.emb_size, lstm_hidden_size=args.hidden_size,
            visual_size=args.visual_size, batch_size_val=args.batch_size,
            MAX_SENTENCE_LEN=args.max_len, learning_rate=args.lr,
            CHUNKED_CE=chunked_ce, FUSED_SCAN=fused_scan)
        w2i, i2w = sio.build_vocab(_tokens(records, sio),
                                   min_freq=conf["MIN_WORD_FREQ"])
        ds = sio.make_split(records, features, w2i, max_len=args.max_len,
                            visual_size=args.visual_size)
        print(f"vocab {len(w2i)}, split {ds.X.shape}")
        counts = np.bincount(ds.Y[ds.Xlen > 0].ravel(), minlength=len(w2i))
        unigram = counts / max(counts.sum(), 1)
        params, _ = T.train_base(ds, len(w2i), conf,
                                 num_epochs=args.num_epochs,
                                 unigram=unigram, seed=args.seed, mesh=mesh,
                                 device_epoch=args.device_resident)
        sio.save_model(args.model_out, params, conf, vocab=w2i)
        print(f"saved base model to {args.model_out}")
        print("val perplexity:", T.validation_perplexity(params, conf, ds))

    elif args.command == "train":
        from icee_tpu.senticap import switched as sw_model

        base_params, conf, _, base_w2i = sio.load_model(args.base_model)
        conf = dict(conf)
        conf["batch_size_val"] = args.batch_size
        conf["learning_rate"] = args.lr
        conf["CHUNKED_CE"] = chunked_ce
        conf["FUSED_SCAN"] = fused_scan
        if base_w2i is None:
            raise SystemExit("base model pickle carries no vocabulary; "
                             "retrain it with this CLI")
        # vocab surgery: keep the base vocabulary, append new frequent words
        new_w2i, _ = sio.build_vocab(_tokens(records, sio),
                                     min_freq=conf["MIN_WORD_FREQ"])
        w2i = dict(base_w2i)
        added = []
        for w in new_w2i:
            if w not in w2i:
                w2i[w] = len(w2i)
                added.append((w, w2i[w]))
        sw_params = sw_model.init_params(
            __import__("jax").random.PRNGKey(args.seed), len(base_w2i), conf,
            base=base_params)
        if added:
            # ClosestWordFinder analogue (mrnn_switched.py:31-73) without
            # spacy: each new sentiment word adopts the base word whose
            # trained embedding is cosine-nearest to the mean embedding of
            # the new word's in-vocab context words in this corpus
            closest = sw_model.make_embedding_closest_fn(
                base_params["wemb"], base_w2i, _tokens(records, sio))
            for w, _ in added:
                ci = closest(w)
                print(f"  {w} -> {[k for k, v in base_w2i.items() if v == ci][0]}")
            sw_params = sw_model.grow_vocab(sw_params, added,
                                            closest_fn=closest)
            print(f"vocab surgery: +{len(added)} sentiment words")
        ds = sio.make_split(records, features, w2i,
                            max_len=conf["MAX_SENTENCE_LEN"],
                            visual_size=conf["visual_size"])
        print(f"vocab {len(w2i)}, split {ds.X.shape}")
        params, _ = T.train_switched(
            ds, base_params, len(w2i), conf, num_epochs=args.num_epochs,
            seed=args.seed, init_params_override=sw_params, mesh=mesh,
            device_epoch=args.device_resident)
        sio.save_model(args.model_out, params, conf, vocab=w2i)
        print(f"saved switched model to {args.model_out}")

    elif args.command == "test":
        params, conf, _, w2i = sio.load_model(args.model_in)
        conf = dict(conf)
        if w2i is None:
            raise SystemExit("model pickle carries no vocabulary")
        i2w = {i: w for w, i in w2i.items()}
        # decode each unique image ONCE (the reference dedups with
        # `if img_id in seen_ids: continue`, train_joint.py:162) — caption
        # records only supply references
        seen = set()
        unique_records = []
        for r in records:
            if r["image"] not in seen:
                seen.add(r["image"])
                unique_records.append(r)
        ds = sio.make_split(unique_records, features, w2i,
                            max_len=conf["MAX_SENTENCE_LEN"],
                            visual_size=conf["visual_size"])
        out = T.decode_split(params, conf, ds, i2w,
                             switched=not args.base_only,
                             beam_size=args.beam_size)
        for rec in out[: args.print_n]:
            if "positive" in rec:
                print(f"[{rec['image']}] pos: {' '.join(rec['positive'])}")
                print(f"[{rec['image']}] des: "
                      f"{' '.join(rec['descriptive'])}")
            else:
                print(f"[{rec['image']}] {' '.join(rec['caption'])}")
        if args.out_dir:
            from icee_tpu.senticap.eval_out import (score_decodes,
                                                    write_eval_outputs)

            refs = {}
            for r in records:
                toks = r.get("tokens") or sio.tokenize(r.get("caption", ""))
                refs.setdefault(r["image"], []).append(toks)
            write_eval_outputs(out, refs, args.out_dir)
            print(json.dumps(score_decodes(out, refs), default=float))
    else:
        raise SystemExit(f"unknown command {args.command}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("command", choices=["base", "train", "test"])
    parser.add_argument("-s", "--sentiment", choices=["pos", "neg"],
                        default="pos")
    parser.add_argument("--captions", type=str, required=True)
    parser.add_argument("--features", type=str, default=None)
    parser.add_argument("--base_model", type=str, default=None)
    parser.add_argument("--model_in", type=str, default=None)
    parser.add_argument("--model_out", type=str, default="senticap_model.pik")
    parser.add_argument("--out_dir", type=str, default=None,
                        help="write eval/output_pos|des + metrics JSON here")
    parser.add_argument("--emb_size", type=int, default=512)
    parser.add_argument("--hidden_size", type=int, default=512)
    parser.add_argument("--visual_size", type=int, default=4096)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--max_len", type=int, default=20)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--num_epochs", type=int, default=10)
    parser.add_argument("--beam_size", type=int, default=20)
    parser.add_argument("--base_only", action="store_true")
    parser.add_argument("--print_n", type=int, default=5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard minibatches over all devices "
                             "(params replicated, gradient psum over ICI)")
    parser.add_argument("--device_resident", action="store_true",
                        help="run each epoch as ONE jitted scan over the "
                             "device-resident split (host ships only the "
                             "int32 batch-index matrix; bit-matches the "
                             "per-batch path)")
    parser.add_argument("--chunked_ce", choices=["auto", "on", "off"],
                        default="auto",
                        help="chunked (mixture) CE / perplexity — the "
                             "(B,T,V) distributions never materialize; "
                             "auto = on for the TPU backend")
    parser.add_argument("--fused_scan", choices=["auto", "on", "off"],
                        default="auto",
                        help="whole-scan Pallas recurrence kernel "
                             "(ops/pallas_senticap_train.py); auto = on "
                             "for the TPU backend")
    main(parser.parse_args())
