"""Probe: streaming-top-k formulations head-to-head on TPU.

The mega beam kernels are VPU-bound on the per-tile exact top-k
(``docs/KERNELS.md``: top-k ~58us vs head matmul ~34us per 2048-wide tile).
This probe times three exact formulations in an otherwise identical kernel
(head matmul + logsumexp + top-k over vocab tiles, no beam machinery):

  reduce : ops/pallas_decode._row_topk (iterative full-width max reduce +
           where/min index find + mask) — the current production form
  fold   : binary tournament fold to 128 lanes carrying (val, idx) with
           lower-index tie-break, final small reduce, full-width mask
  fold512: fold only to 512 lanes (2 levels), reduces on the remainder

All three are token-exact vs lax.top_k (asserted in interpret mode by
tests/test_pallas.py::test_row_topk_fold_matches_lax; this script measures
compiled TPU time with in-jit lax.scan repetitions).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_topk.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icee_tpu.ops.pallas_decode import (NEG, _merge_topk, _row_topk,
                                        _row_topk_fold,
                                        _row_topk_running)


def _row_topk_maskmax(tile, base, ktop, tile_max=None):
    """Reordered reduce form: the mask select feeds the next iteration's
    max directly (where+max in one dataflow chain, hoping Mosaic fuses the
    select into the reduce and skips materializing the masked tile)."""
    import jax
    import jax.numpy as jnp

    r, w = tile.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    cur = tile
    m = tile_max if tile_max is not None else jnp.max(cur, axis=1,
                                                      keepdims=True)
    vals, idxs = [], []
    for it in range(ktop):
        idx = jnp.min(jnp.where(cur == m, col, jnp.int32(2**30)), axis=1,
                      keepdims=True)
        vals.append(m)
        idxs.append(idx + base)
        if it + 1 < ktop:
            cur = jnp.where(col == idx, NEG, cur)
            m = jnp.max(cur, axis=1, keepdims=True)
    return jnp.concatenate(vals, 1), jnp.concatenate(idxs, 1)

def _row_topk_twolevel(tile, base, ktop, tile_max=None, sub_w=256):
    """Two-level exact top-k: per-subtile running maxima + winning-subtile
    extraction.  Each iteration touches the full width only through the
    2-op select-max accumulation (vs the reduce form's ~4-5 ops: full max
    reduce + eq/where/min index find + mask); the per-iteration reduces run
    on ``g = W/sub_w`` and ``sub_w`` widths.  Exclusion of already-extracted
    elements is re-applied per iteration by global-index compare (prior
    extractions in OTHER subtiles can never match — harmless).  Ties ->
    lowest index: subtile winner = lowest subtile attaining the max, within
    subtile = lowest column, which composes to the lowest global column."""
    import jax
    import jax.numpy as jnp

    del tile_max
    r, w = tile.shape
    g = w // sub_w
    assert g * sub_w == w
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (r, g), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (r, sub_w), 1)
    subs = [tile[:, j * sub_w:(j + 1) * sub_w] for j in range(g)]
    submax = jnp.concatenate(
        [jnp.max(s, axis=1, keepdims=True) for s in subs], 1)     # (r, g)
    vals, idxs, prior = [], [], []
    for it in range(ktop):
        m = jnp.max(submax, axis=1, keepdims=True)
        gwin = jnp.min(jnp.where(submax == m, iota_g, jnp.int32(2**30)),
                       axis=1, keepdims=True)
        sel = None
        for j in range(g):                      # winning subtile, 2 ops/elem
            term = jnp.where(gwin == j, subs[j], NEG)
            sel = term if sel is None else jnp.maximum(sel, term)
        cand = gwin * sub_w + iota_w            # global columns of sel
        for e in prior:                         # re-apply exclusions
            sel = jnp.where(cand == e, NEG, sel)
        iw = jnp.min(jnp.where(sel == m, iota_w, jnp.int32(2**30)),
                     axis=1, keepdims=True)
        gidx = gwin * sub_w + iw
        vals.append(m)
        idxs.append(gidx + base)
        prior.append(gidx)
        if it + 1 < ktop:
            newmax = jnp.max(jnp.where(iota_w == iw, NEG, sel), axis=1,
                             keepdims=True)
            submax = jnp.where(iota_g == gwin, newmax, submax)
    return jnp.concatenate(vals, 1), jnp.concatenate(idxs, 1)


ROWS, H, V_TILE, N_VT, K = 640, 512, 2048, 4, 5
REPS_IN = 256  # in-kernel repetitions via grid steps (amortizes the ~27 ms relay dispatch floor)
REPS = 5


def _kernel(h_ref, cw_ref, cb_ref, out_v, out_i, *, variant):
    topk = {"reduce": _row_topk,
            "fold": _row_topk_fold,
            "fold512": functools.partial(_row_topk_fold, fold_to=512),
            "maskmax": _row_topk_maskmax,
            "running": _row_topk_running,
            "running256": functools.partial(_row_topk_running, chunk=256),
            "running512": functools.partial(_row_topk_running,
                                            chunk=512),
            "twolevel": _row_topk_twolevel,
            "twolevel128": functools.partial(_row_topk_twolevel, sub_w=128),
            "twolevel512": functools.partial(_row_topk_twolevel,
                                             sub_w=512)}[variant]
    run_m = jnp.full((ROWS, 1), NEG, jnp.float32)
    run_se = jnp.zeros((ROWS, 1), jnp.float32)
    run_v = jnp.full((ROWS, K), NEG, jnp.float32)
    run_i = jnp.zeros((ROWS, K), jnp.int32)
    for j in range(N_VT):
        logits = jnp.dot(h_ref[:], cw_ref[:, j * V_TILE:(j + 1) * V_TILE],
                         preferred_element_type=jnp.float32)
        logits = logits + cb_ref[0, j * V_TILE:(j + 1) * V_TILE]
        tile_max = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(run_m, tile_max)
        run_se = run_se * jnp.exp(run_m - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True)
        run_m = m_new
        tv, ti = topk(logits, j * V_TILE, K, tile_max=tile_max)
        run_v, run_i = _merge_topk(run_v, run_i, tv, ti, K)
    out_v[:] = run_v - (run_m + jnp.log(run_se))
    out_i[:] = run_i


def build(variant):
    @jax.jit
    def run(h, cw, cb):
        return pl.pallas_call(
            functools.partial(_kernel, variant=variant),
            grid=(REPS_IN,),
            in_specs=[pl.BlockSpec((ROWS, H), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, N_VT * V_TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, N_VT * V_TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((ROWS, K), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((ROWS, K), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((ROWS, K), jnp.float32),
                       jax.ShapeDtypeStruct((ROWS, K), jnp.int32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(h, cw, cb)
    return run


def main():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((ROWS, H)), jnp.bfloat16)
    cw = jnp.asarray(rng.standard_normal((H, N_VT * V_TILE)) * 0.05,
                     jnp.bfloat16)
    cb = jnp.asarray(rng.standard_normal((1, N_VT * V_TILE)) * 0.01,
                     jnp.float32)

    ref = None
    for variant in (sys.argv[1:] or ["reduce", "maskmax"]):
        fn = build(variant)
        try:
            t0 = time.perf_counter()
            v, i = fn(h, cw, cb)
            v, i = np.asarray(v), np.asarray(i)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        if ref is None:
            ref = (v, i)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(h, cw, cb))
            times.append((time.perf_counter() - t0) / REPS_IN)
        med = float(np.median(times))
        match = bool((v == ref[0]).all() and (i == ref[1]).all())
        print(f"{variant:7s}: median {med*1e6:7.1f} us/step-equiv  "
              f"compile {compile_s:5.1f}s  match_reduce={match}", flush=True)


if __name__ == "__main__":
    main()
