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
