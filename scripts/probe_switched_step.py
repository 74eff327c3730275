"""Phase attribution for the SentiCap SWITCHED train step (TPU).

Decides whether a whole-scan Pallas kernel for the double-LSTM recurrence
is worth building: if the step is loss-bound the chunked mixture CE already
covers it; if it is scan-bound (per-step HBM weight traffic, 2 x w_lstm
(1024, 2048) read per timestep) the kernel wins.

Variants at the MTurk regime (B=128, T=22, emb/hidden 512, V=8192):
  mat    : materialized mixture loss (CHUNKED_CE=False)   — round-2 bench
  chunk  : chunked mixture loss (CHUNKED_CE=True)
  scan   : grad of (sum(hh_o)+sum(hh_n)+gate terms) only  — no CE at all

Usage: python scripts/probe_switched_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, B = 8192, 128


def main():
    import jax
    import jax.numpy as jnp

    from icee_tpu.senticap import switched as sw_model
    from icee_tpu.senticap.config import senticap_conf
    from icee_tpu.senticap.solver import make_solver
    from icee_tpu.senticap.train import make_switched_step

    rng = np.random.default_rng(0)

    def data_for(conf):
        t = conf["MAX_SENTENCE_LEN"] + 2
        n = B * 4
        return {
            "X": jnp.asarray(rng.integers(2, V, (n, t)), jnp.int32),
            "Y": jnp.asarray(rng.integers(2, V, (n, t)), jnp.int32),
            "Xlen": jnp.asarray(
                (np.arange(t)[None, :] < rng.integers(5, t, (n, 1))),
                jnp.float32),
            "V": jnp.asarray(
                rng.standard_normal((n, conf["visual_size"])), jnp.float32),
            "SW": jnp.asarray(rng.integers(0, 2, (n, t)), jnp.float32),
            "senti": jnp.ones((n,), jnp.float32),
        }

    def bench_step(name, conf):
        params = sw_model.init_params(jax.random.PRNGKey(0), V, conf)
        solver = make_solver(conf, sw_model.switch_param_mask(params))
        opt_state = solver.init(params)
        step = make_switched_step(conf, solver)
        data = data_for(conf)
        idx = jnp.asarray(rng.integers(0, B * 4, (16, B)), jnp.int32)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def many(params, opt_state):
            def body(carry, ib):
                p, o = carry
                p, o, loss = step(p, o, data, ib, key)
                return (p, o), loss
            (_, _), losses = jax.lax.scan(body, (params, opt_state), idx)
            return losses[-1]

        t0 = time.perf_counter()
        np.asarray(many(params, opt_state))
        print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(params, opt_state))
            ts.append((time.perf_counter() - t0) / 16)
        med = float(np.median(ts)) * 1e3
        print(f"{name}: {med:7.2f} ms/step", flush=True)
        return med

    def bench_scan_only(conf):
        """grad of a V-free functional of the scan — isolates the
        double-LSTM recurrence + gate from every loss head."""
        params = sw_model.init_params(jax.random.PRNGKey(0), V, conf)
        data = data_for(conf)
        x, y = data["X"][:B], data["Y"][:B]
        v, senti0 = data["V"][:B], data["senti"][0]

        def loss(p):
            (hh_o, hh_n, att), la, l1a = sw_model.forward(
                p, conf, x, v, senti0, return_hiddens=True)
            return (jnp.sum(hh_o) * 1e-3 + jnp.sum(hh_n) * 1e-3
                    + jnp.sum(la) * 1e-3)

        grad_fn = jax.grad(loss)

        @jax.jit
        def many(p):
            def body(q, _):
                g = grad_fn(q)
                q = jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, q, g)
                return q, g["att_b"][0]
            q, outs = jax.lax.scan(body, p, None, length=16)
            live = sum(jnp.sum(w) for w in jax.tree_util.tree_leaves(q))
            return outs[-1] + live * 1e-30

        t0 = time.perf_counter()
        np.asarray(many(params))
        print(f"scan : compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(params))
            ts.append((time.perf_counter() - t0) / 16)
        med = float(np.median(ts)) * 1e3
        print(f"scan : {med:7.2f} ms (fwd+bwd of the recurrence only)",
              flush=True)
        return med

    conf = senticap_conf(emb_size=512, lstm_hidden_size=512)
    t_mat = bench_step("mat   ", dict(conf, CHUNKED_CE=False,
                                      FUSED_SCAN=False))
    t_chunk = bench_step("chunk ", dict(conf, CHUNKED_CE=True,
                                        FUSED_SCAN=False))
    t_fused = bench_step("ck+fus", dict(conf, CHUNKED_CE=True,
                                        FUSED_SCAN=True))
    t_scan = bench_scan_only(dict(conf, FUSED_SCAN=False))
    print(f"\nmat {t_mat:.2f} | chunk {t_chunk:.2f} | chunk+fused "
          f"{t_fused:.2f} | scan-only(xla) {t_scan:.2f} ms")


if __name__ == "__main__":
    main()
