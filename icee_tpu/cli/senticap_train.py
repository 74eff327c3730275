"""``python -m icee_tpu.cli.senticap_train`` — SentiCap drivers (reference
``train_mscoco.py`` / ``train_joint.py``, SURVEY C10).

Subcommands mirror the reference CLI (``train_joint.py:453-491``:
``train|test -s pos|neg``):

- ``base``   — train the background COCO-style caption model
  (``train_mscoco.py``)
- ``train``  — switch ("gap filler") training from a base checkpoint
  (``run_train_gap_filler``)
- ``test``   — beam-decode the styled and descriptive sentence per image
  with switch-attention traces (``run_load_gap_filler``)

Data: ``--captions`` JSON (records with image/tokens|caption/sentiment/
switch) + ``--features`` npz or .mat (VGG-4096 per image).
"""

import argparse
import json

import numpy as np


def main(args) -> None:
    from icee_tpu.senticap import io as sio
    from icee_tpu.senticap import train as T
    from icee_tpu.senticap.config import senticap_conf

    conf = senticap_conf(
        emb_size=args.emb_size,
        lstm_hidden_size=args.hidden_size,
        visual_size=args.visual_size,
        batch_size_val=args.batch_size,
        MAX_SENTENCE_LEN=args.max_len,
        learning_rate=args.lr,
    )

    records = sio.load_captions_json(args.captions)
    if args.command in ("train", "test") and args.sentiment == "neg":
        for r in records:
            r.setdefault("sentiment", -1.0)
    features = sio.load_features(args.features) if args.features else None
    caps = [r.get("tokens") or sio.tokenize(r.get("caption", ""))
            for r in records]
    w2i, i2w = sio.build_vocab(caps, min_freq=conf["MIN_WORD_FREQ"])
    ds = sio.make_split(records, features, w2i, max_len=args.max_len,
                        visual_size=args.visual_size)
    print(f"vocab {len(w2i)}, split {ds.X.shape}")

    if args.command == "base":
        counts = np.bincount(ds.Y[ds.Xlen > 0].ravel(), minlength=len(w2i))
        unigram = counts / max(counts.sum(), 1)
        params, _ = T.train_base(ds, len(w2i), conf,
                                 num_epochs=args.num_epochs,
                                 unigram=unigram, seed=args.seed)
        sio.save_model(args.model_out, params, conf)
        print(f"saved base model to {args.model_out}")
        print("val perplexity:",
              T.validation_perplexity(params, conf, ds))
    elif args.command == "train":
        base_params, _, _ = sio.load_model(args.base_model)
        params, _ = T.train_switched(ds, base_params, len(w2i), conf,
                                     num_epochs=args.num_epochs,
                                     seed=args.seed)
        sio.save_model(args.model_out, params, conf)
        print(f"saved switched model to {args.model_out}")
    elif args.command == "test":
        params, saved_conf, _ = sio.load_model(args.model_in)
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
        if args.out_json:
            with open(args.out_json, "w") as f:
                json.dump(out, f, default=float)
            print(f"wrote {args.out_json}")
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
    parser.add_argument("--out_json", type=str, default=None)
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
    main(parser.parse_args())
