"""Subprocess worker for the 2-process multi-host test (not a pytest file).

Each process owns 4 virtual CPU devices (8 global), initializes
``jax.distributed`` through ``icee_tpu.parallel.mesh.init_distributed``,
loads ONLY its shard of the dataset (``shard_examples``), assembles global
batches with ``make_array_from_process_local_data`` (``parallel/data.py``)
and runs one DP x TP-sharded factual train step over the global mesh.

Usage: multihost_worker.py <process_id> <num_processes> <port>
Prints one JSON line with the loss and a parameter checksum.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from icee_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    assert len(jax.devices()) == 4 * n_proc

    import jax.numpy as jnp
    import numpy as np

    from icee_tpu.models import encoder as enc_mod
    from icee_tpu.models import factored_lstm as fl
    from icee_tpu.core.config import DecoderConfig, EncoderConfig, TrainConfig
    from icee_tpu.parallel import data as pdata
    from icee_tpu.parallel import mesh as pmesh
    from icee_tpu.parallel import train as ptrain
    from icee_tpu.train import optim
    from icee_tpu.train.steps import make_caption_steps

    n_dev = len(jax.devices())
    shape = ptrain.dp_tp_shape(n_dev, tp=2)
    mesh = pmesh.make_mesh(shape)

    cfg = DecoderConfig(vocab_size=256, embed_size=16, hidden_size=32,
                        factored_size=32)
    ecfg = EncoderConfig(embed_size=16, feature_size=24)
    tcfg = TrainConfig()

    # deterministic global dataset; each host takes only its contiguous shard
    rng = np.random.default_rng(0)
    b_global, t = 8, 10
    all_pooled = rng.standard_normal((b_global, 24)).astype(np.float32)
    all_caps = rng.integers(0, cfg.vocab_size, (b_global, t)).astype(np.int32)
    all_lens = rng.integers(4, t, (b_global,)).astype(np.int32)
    idx = pdata.shard_examples(list(range(b_global)))
    assert len(idx) == b_global // n_proc, idx

    dec = fl.init_params(jax.random.PRNGKey(0), cfg)
    head = enc_mod.init_head_params(jax.random.PRNGKey(1), ecfg)
    optimizer = optim.make_adam(tcfg.lr_caption, tcfg)
    fac_step, _, _ = make_caption_steps(cfg, tcfg, optimizer, optimizer,
                                        factored=True)
    dec = ptrain.place_decoder(dec, mesh)
    head = ptrain.place_replicated(head, mesh)
    opt_state = optimizer.init((dec, head))

    pooled = pdata.global_batch(mesh, all_pooled[idx])
    captions = pdata.global_batch(mesh, all_caps[idx])
    lengths = pdata.global_batch(mesh, all_lens[idx])
    smask = pdata.global_batch(mesh, np.ones((len(idx),), bool))
    assert pooled.shape == (b_global, 24)  # global shape spans both hosts

    dec, head, opt_state, loss = fac_step(
        dec, head, opt_state, pooled, captions, lengths, smask,
        jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    # replicated-param checksum: must agree across processes
    cksum = float(jnp.sum(jnp.abs(dec["W_w"])))

    # --- the USER-FACING trainer path over the same mesh (round 3): each
    # process feeds loaders holding only its local batch rows; the trainer's
    # _to_device assembles global arrays via make_array_from_process_local_data
    from icee_tpu.data.pipeline import CaptionBatch
    from icee_tpu.train.loops import MultitaskTrainer

    tcfg2 = TrainConfig(mode="happy", teacher_forcing_ratio=1.0,
                        log_step=10_000)
    local_batch = CaptionBatch(
        images=all_pooled[idx], captions=all_caps[idx],
        lengths=all_lens[idx], sample_mask=np.ones((len(idx),), bool))
    trainer = MultitaskTrainer(
        cfg, tcfg2, None,
        fl.init_params(jax.random.PRNGKey(0), cfg),
        enc_mod.init_head_params(jax.random.PRNGKey(1), ecfg),
        sample_fn=lambda *a: [], mesh=mesh)
    stats = None
    for _ in range(2):
        stats = trainer._run_train([local_batch], 0, 10_000, "FAC")
    print(json.dumps({"pid": pid, "process_count": jax.process_count(),
                      "loss": float(loss), "cksum": cksum,
                      "trainer_loss": float(stats.loss)}))


if __name__ == "__main__":
    main()
