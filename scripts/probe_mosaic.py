"""Probe Mosaic lowering support on the real TPU for mega-kernel design choices.

Checks, each in isolation (compile + run tiny shapes):
  1. value-level jnp.take(table, idx, axis=0) inside a kernel (embedding gather)
  2. sublane-concat of K small arrays -> flat rows
  3. dynamic lane-column write via iota-where
  4. big VMEM residency (~24 MB of constant blocks)
Prints one line per probe: name ok/err.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK {getattr(out, 'shape', None)}")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def take_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]
    idx = idx_ref[:].reshape(-1)
    out_ref[:] = jnp.take(tab, idx, axis=0)


def probe_take():
    tab = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx = jnp.array([[3, 7, 250, 0, 1, 2, 9, 11]], dtype=jnp.int32)
    out = pl.pallas_call(
        take_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    expect = jnp.take(tab, jnp.array([3, 7, 250, 0, 1, 2, 9, 11]), axis=0)
    assert jnp.allclose(out, expect), "wrong values"
    return out


def concat_kernel(a_ref, out_ref):
    parts = [a_ref[i * 8:(i + 1) * 8, :] * (i + 1.0) for i in range(4)]
    out_ref[:] = jnp.concatenate(parts, axis=0)


def probe_concat():
    a = jnp.ones((32, 128), jnp.float32)
    return pl.pallas_call(
        concat_kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)


def colwrite_kernel(a_ref, t_ref, out_ref):
    t = t_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, a_ref.shape, 1)
    out_ref[:] = jnp.where(col == t, 7, a_ref[:])


def probe_colwrite():
    a = jnp.zeros((8, 128), jnp.int32)
    t = jnp.array([5], jnp.int32)
    return pl.pallas_call(
        colwrite_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, t)


def bigvmem_kernel(c_ref, e_ref, s_ref, x_ref, out_ref):
    h = jnp.dot(x_ref[:], e_ref[:], preferred_element_type=jnp.float32)
    h = jnp.dot(h.astype(jnp.bfloat16), s_ref[:],
                preferred_element_type=jnp.float32)
    out_ref[:] = jnp.dot(h.astype(jnp.bfloat16), c_ref[:],
                         preferred_element_type=jnp.float32)[:, :128]


def probe_bigvmem():
    cw = jnp.ones((512, 8192), jnp.bfloat16)       # 8 MB
    emb = jnp.ones((8192, 384), jnp.bfloat16)      # 6.3 MB  (as x@emb -> 512)
    sw = jnp.ones((384, 512), jnp.bfloat16)
    x = jnp.ones((320, 8192), jnp.bfloat16)
    return pl.pallas_call(
        bigvmem_kernel,
        out_shape=jax.ShapeDtypeStruct((320, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cw, emb, sw, x)


def tala0_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]
    idx = jnp.broadcast_to(idx_ref[:].reshape(-1, 1), tab.shape)
    out_ref[:] = jnp.take_along_axis(tab, idx, axis=0)


def probe_tala0():
    tab = (jnp.arange(256, dtype=jnp.float32)[:, None]
           * jnp.ones((1, 128), jnp.float32))
    idx = jnp.arange(256, dtype=jnp.int32)[::-1].reshape(2, 128)
    out = pl.pallas_call(
        tala0_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    expect = jnp.flip(tab, axis=0)
    assert jnp.allclose(out, expect), f"wrong values {out[:3,0]} vs {expect[:3,0]}"
    return out


def tala0big_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]
    idx = jnp.broadcast_to(idx_ref[:].reshape(-1, 1), tab.shape)
    out_ref[:] = jnp.take_along_axis(tab, idx, axis=0)[:320]


def probe_tala0_big():
    tab = (jnp.arange(8192, dtype=jnp.float32)[:, None]
           * jnp.ones((1, 384), jnp.float32))
    idx = (jnp.arange(8192, dtype=jnp.int32) * 37 + 11) % 8192
    idx = idx.reshape(64, 128)
    out = pl.pallas_call(
        tala0big_kernel,
        out_shape=jax.ShapeDtypeStruct((320, 384), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab, idx)
    expect = (((jnp.arange(8192) * 37 + 11) % 8192).astype(jnp.float32)[:320, None]
              * jnp.ones((1, 384)))
    assert jnp.allclose(out, expect), "wrong values big"
    return out


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe("take_axis0", probe_take)
    probe("sublane_concat", probe_concat)
    probe("iota_colwrite", probe_colwrite)
    probe("big_vmem_24MB", probe_bigvmem)
    probe("tala_axis0_eqshape", probe_tala0)
    probe("tala_axis0_8192x384", probe_tala0_big)
