"""TPU parity probe for the chunked window sweep (pallas_spmv._make_kernel).

Builds PlannedGathers whose window heights straddle _FULL_UNROLL_ROWS so
both the unrolled and the fori_loop-chunked sweeps execute, and checks the
kernel against the numpy reference.  Run on the real chip:

    python tools/probe_chunked_sweep.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from arcanefem_tpu.sparse.pallas_spmv import (  # noqa: E402
    _FULL_UNROLL_ROWS, PlannedGather,
)

print("platform:", jax.devices()[0].platform)
rng = np.random.default_rng(0)

for tag, n_rows, W, n_src, spread in [
    ("small-window (unrolled)", 20000, 8, 30000, 900),
    ("wide-window (chunked)", 60000, 8, 120000, 60000),
    ("wide-W1 (chunked)", 200000, 1, 400000, 150000),
]:
    # banded random columns: row r draws W sources near r*(n_src/n_rows)
    center = (np.arange(n_rows) * (n_src / n_rows)).astype(np.int64)
    cols = center[:, None] + rng.integers(-spread, spread, (n_rows, W))
    cols = np.clip(cols, 0, n_src - 1)
    w = rng.standard_normal((n_rows, W)).astype(np.float32)
    pg = PlannedGather.build(cols, w, max_window=128 * 1024)
    if pg is None:
        print(f"{tag}: NO PLAN (window too wide)")
        continue
    key = pg.key if hasattr(pg, "key") else pg.stage1.key
    vl = sum(key[1])
    table = rng.standard_normal(n_src).astype(np.float32)
    got = np.asarray(jax.jit(pg)(jax.numpy.asarray(table)))
    want = (w * table[cols]).sum(axis=1)
    err = np.abs(got - want).max() / max(1e-30, np.abs(want).max())
    mode = "unrolled" if vl <= _FULL_UNROLL_ROWS else "chunked"
    print(f"{tag}: VL={vl} ({mode}) rel_err={err:.2e} "
          f"{'OK' if err < 1e-5 else 'FAIL'}")
