"""Caption serving engine: preloaded models, jitted decode, batched beams.

Parity target + fix: the reference serving pipeline unpickles ENTIRE model
modules from disk on EVERY request (``app/backend/sample.py:52-97``,
``model.py:490-499`` — SURVEY.md flags this as the latency hot spot).  Here
every (variant, mode) pipeline is loaded once at startup and its beam decode
is compiled once; requests run image decode (host) -> ResNet (TPU) -> beam
(TPU) with no model IO.

Beam semantics are the serving copy's (image feature fed at step 1,
``app/backend/model.py:414-417``).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import numpy as np

from icee_tpu.core.config import MODES, mode_id
from icee_tpu.serve.config import MODEL_VARIANTS, ServeConfig


class CaptionEngine:
    def __init__(self, config: ServeConfig, smoke_mode: bool = False,
                 image_size: int = 224, dec_cfg=None, att_cfg=None,
                 enc_cfg=None):
        """``smoke_mode``: build every variant with random weights when no
        checkpoints are configured (demo/offline).  The ``*_cfg`` overrides
        exist for tests/small deployments; defaults are the flagship sizes."""
        import jax

        from icee_tpu.core.config import (
            AttentionDecoderConfig,
            DecoderConfig,
            EncoderConfig,
        )
        from icee_tpu.data.vocab import Vocabulary, load_vocab
        from icee_tpu.models import encoder as enc_mod
        from icee_tpu.models import resnet

        self.config = config
        self.image_size = image_size
        if config.vocab_path and os.path.exists(config.vocab_path):
            self.vocab = load_vocab(config.vocab_path)
        elif smoke_mode:
            from icee_tpu.data.vocab import SPECIALS

            self.vocab = Vocabulary()
            for s in SPECIALS:
                self.vocab.add_word(s)
            for w in ["sebuah", "gambar", "tanpa", "model"]:
                self.vocab.add_word(w)
        else:
            raise FileNotFoundError(f"vocab not found: {config.vocab_path}")

        v = len(self.vocab)
        self.dec_cfg = dec_cfg or DecoderConfig(vocab_size=v)
        self.att_cfg = att_cfg or AttentionDecoderConfig(vocab_size=v)
        self.enc_cfg = enc_cfg or EncoderConfig()

        from icee_tpu.cli.common import load_resnet_params

        self.backbone = load_resnet_params(
            config.resnet_weights,
            getattr(config, "backbone_dtype", "float32"))
        self.models: Dict[str, dict] = {}
        self._decode_cache: Dict = {}
        self._load_models(smoke_mode)

    # -- model loading ----------------------------------------------------

    def _load_models(self, smoke_mode: bool) -> None:
        """Load one (decoder, head) pipeline PER (variant, mode), like the
        reference's 16-entry registry (``app/backend/config.py:13-38``).
        Identical paths (e.g. our stacked-style checkpoints, which serve all
        four modes from one file) are loaded once and shared."""
        import zlib

        import jax

        from icee_tpu.models import attention as att_mod
        from icee_tpu.models import encoder as enc_mod
        from icee_tpu.models import factored_lstm as fl
        from icee_tpu.models import lstm as nic_mod

        for variant in MODEL_VARIANTS:
            paths = self.config.checkpoint_paths.get(variant, {})
            if not any(paths.values()) and not smoke_mode:
                continue
            key = jax.random.PRNGKey(zlib.crc32(variant.encode()) % (2**31))
            if variant == "stylenet":
                dec0 = fl.init_params(key, self.dec_cfg)
            elif variant == "nic":
                dec0 = nic_mod.init_params(key, self.dec_cfg)
            elif variant == "stylenet_att":
                dec0 = att_mod.init_factored_att_params(key, self.att_cfg)
            else:
                dec0 = att_mod.init_rnn_att_params(key, self.att_cfg)
            head0 = enc_mod.init_head_params(
                jax.random.PRNGKey(zlib.crc32(variant.encode()) % 1000 + 1),
                self.enc_cfg)
            by_path = {}
            modes = {}
            for mode in MODES:
                path = paths.get(mode)
                if path and os.path.exists(path):
                    if path not in by_path:
                        by_path[path] = self._restore(variant, path, dec0,
                                                      head0)
                    dec, head = by_path[path]
                elif smoke_mode:
                    dec, head = dec0, head0
                else:
                    continue
                modes[mode] = {"decoder": dec, "head": head}
            if modes:
                self.models[variant] = modes

    def _restore(self, variant, path, dec_template, head_template):
        """Load our orbax checkpoints or reference torch pickles."""
        if path.endswith((".pth", ".tar", ".ckpt")):
            from icee_tpu.checkpoint import torch_import as ti
            from icee_tpu.checkpoint.torch_pickle import (
                load_torch_pickle,
                module_state_dict,
            )

            # full-module pickles load via the stub unpickler, so the
            # reference's model classes are NOT needed on the path
            sd = load_torch_pickle(path)
            if isinstance(sd, dict) and "decoder" in sd:  # full ckpt pickle
                dec_sd = module_state_dict(sd["decoder"])
                enc_sd = module_state_dict(sd["encoder"])
            else:
                dec_sd, enc_sd = sd, None
            if variant == "stylenet":
                dec = ti.import_factored_decoder_state_dict(dec_sd)
            elif variant == "stylenet_att":
                dec = ti.import_factored_att_decoder_state_dict(dec_sd)
            elif variant == "nic":
                dec = ti.import_nic_decoder_state_dict(dec_sd)
            else:
                dec = ti.import_nic_att_decoder_state_dict(dec_sd)
            head = head_template
            if enc_sd is not None:
                head = ti.import_encoder_head_state_dict(
                    {k: v for k, v in enc_sd.items()
                     if not k.startswith("resnet.")})
            return dec, head
        from icee_tpu.checkpoint.ckpt import load_params

        params = load_params(path)
        return params["decoder"], params["head"]

    # -- inference --------------------------------------------------------

    def _features(self, image_path: str):
        """ONE jitted backbone pass; pooled + spatial both derive from the
        same feature map (the review found the previous version running the
        full ResNet twice per request)."""
        import jax
        import jax.numpy as jnp

        from icee_tpu.data.transforms import host_decode_resize

        if not hasattr(self, "_features_fn"):
            from icee_tpu.data.transforms import normalize
            from icee_tpu.models import resnet

            @jax.jit
            def run(img):
                x = normalize(img[None])
                fmap, _ = resnet.forward(self.backbone, x, train_bn=False)
                pooled = jnp.mean(fmap, axis=(1, 2))
                spatial = resnet.adaptive_avg_pool(fmap, (14, 14))
                return pooled, spatial.reshape(1, 14 * 14, spatial.shape[-1])

            self._features_fn = run

        img = host_decode_resize(image_path, self.image_size)
        return self._features_fn(jnp.asarray(img))

    def _decode_fn(self, variant: str, mode: str, k: int = 5):
        """Build (once per variant+mode pipeline) the jitted beam decode.
        Pipelines sharing a decoder object share the compiled fn."""
        dec = self.models[variant][mode]["decoder"]
        cache_key = (variant, id(dec))
        if cache_key in self._decode_cache:
            return self._decode_cache[cache_key]
        import jax
        import jax.numpy as jnp

        from icee_tpu.decode.beam import beam_search
        from icee_tpu.models import attention as att_mod
        from icee_tpu.models import factored_lstm as fl
        from icee_tpu.models import lstm as nic_mod

        vocab_size = len(self.vocab)

        if variant == "stylenet":
            def run(feat, style):
                return beam_search(
                    embed_fn=lambda t: fl.embed(dec, t),
                    step_fn=lambda x, s: fl.decode_step(dec, x, s, style),
                    init_model_state=fl.initial_state(k, self.dec_cfg),
                    start_token=self.vocab.start, end_token=self.vocab.end,
                    k=k, max_seq_length=self.dec_cfg.max_seq_length,
                    vocab_size=vocab_size,
                    first_input=jnp.tile(feat, (k, 1)))
        elif variant == "nic":
            def run(feat, style):
                return beam_search(
                    embed_fn=lambda t: nic_mod.embed(dec, t),
                    step_fn=lambda x, s: nic_mod.decode_step(dec, x, s),
                    init_model_state=nic_mod.initial_state(k, self.dec_cfg),
                    start_token=self.vocab.start, end_token=self.vocab.end,
                    k=k, max_seq_length=self.dec_cfg.max_seq_length,
                    vocab_size=vocab_size,
                    first_input=jnp.tile(feat, (k, 1)))
        elif variant == "stylenet_att":
            def run(spatial, style):
                feats_k = jnp.tile(spatial, (k, 1, 1))
                att = att_mod._select_attention(dec["attention"], style)
                att1 = feats_k @ att["enc_w"] + att["enc_b"]  # hoisted

                def step(x, s):
                    logits, _, s2 = att_mod.factored_att_decode_step(
                        dec, x, feats_k, s, style, att1=att1)
                    return logits, s2

                return beam_search(
                    embed_fn=lambda t: fl.embed(dec, t),
                    step_fn=step,
                    init_model_state=att_mod.init_hidden_state(dec, feats_k),
                    start_token=self.vocab.start, end_token=self.vocab.end,
                    k=k, max_seq_length=self.att_cfg.max_seq_length,
                    vocab_size=vocab_size)
        else:  # nic_att
            def run(spatial, style):
                feats_k = jnp.tile(spatial, (k, 1, 1))
                att = dec["attention"]
                att1 = feats_k @ att["enc_w"] + att["enc_b"]  # hoisted

                def step(x, s):
                    logits, _, s2 = att_mod.rnn_att_decode_step(
                        dec, x, feats_k, s, att1=att1)
                    return logits, s2

                return beam_search(
                    embed_fn=lambda t: jnp.take(dec["embed"], t, axis=0),
                    step_fn=step,
                    init_model_state=att_mod.init_hidden_state(dec, feats_k),
                    start_token=self.vocab.start, end_token=self.vocab.end,
                    k=k, max_seq_length=self.att_cfg.max_seq_length,
                    vocab_size=vocab_size)

        fn = jax.jit(run)
        self._decode_cache[cache_key] = fn
        return fn

    def _detok(self, tokens, length) -> str:
        """id seq -> caption: strip <start>/<end>, drop trailing <unk>
        (``app/backend/sample.py:82-96``)."""
        words = self.vocab.decode(np.asarray(tokens)[: int(length)])
        while words and words[-1] == "<unk>":
            words.pop()
        return " ".join(words)

    def caption(self, image_path: str, mode: str) -> Dict[str, str]:
        """Run every loaded variant on one image (``run.py:42-57``)."""
        import jax.numpy as jnp

        import jax

        if mode not in MODES:
            raise ValueError(f"invalid mode {mode}")
        style = jnp.asarray(mode_id(mode))
        pooled, spatial = self._features(image_path)
        out = {}
        for variant in MODEL_VARIANTS:
            pipeline = self.models.get(variant, {}).get(mode)
            if pipeline is None:
                out[variant] = "-"
                continue
            if variant.endswith("_att"):
                feat = spatial[0:1]
            else:
                from icee_tpu.models import encoder as enc_mod

                feat, _ = enc_mod.encode_global_from_pooled(
                    pipeline["head"], pooled, train=False)
            res = self._decode_fn(variant, mode)(feat, style)
            out[variant] = self._detok(res.tokens, res.length)
        return out
