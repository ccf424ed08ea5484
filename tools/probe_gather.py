"""Probe which in-VMEM gather forms Mosaic compiles on this TPU.

Candidates to replace the V/128-step window sweep of sparse/pallas_spmv.py:
  A. take_along_axis(win (K,128), hi (G,128), axis=0)  — sublane gather
  B. win.reshape(-1)[flat_idx]                          — flat 1D gather
  C. the existing lane sweep (baseline)

Run on the TPU:  python tools/probe_gather.py [K] [G]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe_A(K, G):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(win_ref, hi_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(win_ref[:], hi_ref[:], axis=0)

    win = jnp.asarray(np.random.rand(K, 128).astype(np.float32))
    hi = jnp.asarray(np.random.randint(0, K, (G, 128)).astype(np.int32))
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, hi)
    want = np.take_along_axis(np.asarray(win), np.asarray(hi), axis=0)
    ok = np.allclose(np.asarray(y), want)
    return ok


def probe_B(K, G):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(win_ref, idx_ref, out_ref):
        flat = win_ref[:].reshape(-1)
        out_ref[:] = flat[idx_ref[:]]

    win = jnp.asarray(np.random.rand(K, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, K * 128, (G, 128)).astype(np.int32))
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, idx)
    want = np.asarray(win).reshape(-1)[np.asarray(idx)]
    ok = np.allclose(np.asarray(y), want)
    return ok


def bench_A(K, G, iters=200, nb=256):
    """Grid version: nb blocks, each gathers (G,128) from its own window."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(win_ref, hi_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(win_ref[0], hi_ref[0], axis=0)

    win = jnp.asarray(np.random.rand(nb, K, 128).astype(np.float32))
    hi = jnp.asarray(
        np.random.randint(0, K, (nb, G, 128)).astype(np.int32)
    )
    f = jax.jit(
        lambda w, h: pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, K, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, G, 128), jnp.float32),
        )(w, h)
    )
    y = f(win, hi)
    float(jnp.sum(y))  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(win, hi)
    float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / iters
    n_el = nb * G * 128
    print(f"  bench A: K={K} G={G} nb={nb}: {dt*1e6:.1f} us "
          f"-> {n_el/dt/1e9:.2f} Gelem/s")


if __name__ == "__main__":
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    for name, fn in (("A sublane take_along_axis", probe_A),
                     ("B flat 1D gather", probe_B)):
        try:
            ok = fn(K, G)
            print(f"{name}: compiles, correct={ok}")
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAILED — {msg}")
    try:
        bench_A(K, G)
        bench_A(1024, G)
    except Exception as e:
        print("bench A failed:", str(e).split("\n")[0][:200])
