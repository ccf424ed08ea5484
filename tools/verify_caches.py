"""Fail if any cache the DEFAULT bench config reads is missing.

Round-3 postmortem (VERDICT r3 #1): a cache-key bump (asm plan -> _v2)
landed without its regenerated cache, so the driver's end-of-round bench
spent its entire timeout inside an ~11-minute host plan rebuild and
produced NO result JSON (BENCH_r03: rc=124, parsed=null).  Rule since:
**a cache-key bump and its regenerated cache land in the same session**,
and this gate proves it — run it before ending any session that touched
bench.py or the planner/AMG cache keys:

    python tools/verify_caches.py            # checks the TPU default keys

Exit 0 = every default-path cache file exists (sizes printed).
Exit 1 = at least one is missing — regenerate it (a plain `python
bench.py` run on the TPU rebuilds and re-caches everything) before the
driver runs.

Also warns about orphaned .tmp files (an interrupted _pickle_cache write,
exactly the BENCH_r03 smoking gun) and stale same-prefix caches from old
key versions that only waste disk.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from arcanefem_tpu.utils.cache import CACHE_DIR  # noqa: E402


def main() -> int:
    paths = bench.default_cache_paths(platform="tpu")
    missing = []
    for what, path in sorted(paths.items()):
        if os.path.exists(path):
            gb = os.path.getsize(path) / 1e9
            print(f"  ok      {what:<10} {gb:7.2f} GB  {path}")
        else:
            missing.append((what, path))
            print(f"  MISSING {what:<10}             {path}")

    tmps = glob.glob(os.path.join(CACHE_DIR, "*.tmp"))
    for t in tmps:
        print(f"  warn: orphaned partial write {t} "
              "(interrupted cache dump; delete it)")

    # warm-compile heuristic (VERDICT r4 #5 / round-3 _v2 lesson): any
    # kernel/layout source newer than the newest persistent-compile-cache
    # entry means the driver's bench likely pays a fresh multi-minute
    # remote compile (BENCH_r04: 323 s compile+first).  Run one warm
    # `python bench.py` on the TPU after kernel changes, THEN this gate.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jc = glob.glob(os.path.join(repo, ".jax_cache", "*"))
    if jc:
        cache_mtime = max(os.path.getmtime(f) for f in jc)
        hot = glob.glob(os.path.join(repo, "arcanefem_tpu", "sparse", "*.py")) \
            + glob.glob(os.path.join(repo, "arcanefem_tpu", "ops", "*.py")) \
            + glob.glob(os.path.join(repo, "arcanefem_tpu", "mesh",
                                     "pallas_stencil.py"))
        stale = [f for f in hot if os.path.getmtime(f) > cache_mtime]
        if stale:
            print(f"  warn: {len(stale)} kernel source(s) newer than the "
                  "newest .jax_cache entry — the driver bench may pay a "
                  "fresh compile; run a warm `python bench.py` first:")
            for f in stale[:6]:
                print(f"        {os.path.relpath(f, repo)}")
    else:
        print("  warn: .jax_cache is empty — every kernel compiles fresh")

    if missing:
        print(f"\nFAIL: {len(missing)} default-path cache(s) missing — the "
              "driver's bench run would pay the full host rebuild "
              "(BENCH_r03 failure mode).  Run `python bench.py` on the TPU "
              "to regenerate, or revert the key bump.")
        return 1
    print("\nall default-path caches present")
    return 0


if __name__ == "__main__":
    sys.exit(main())
