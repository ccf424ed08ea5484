"""Setup-artifact cache directory.

Mesh/topology/AMG-hierarchy/assembler-plan caches are expensive host-side
setup (the 10M topology build alone is ~15 min on a 1-CPU host) but pure
functions of (mesh key, config).  They used to live under /tmp, which the
session sandbox wipes on restart — losing ~30 min of rebuild per restart.
Default to a repo-local dir (same filesystem, survives restarts, and the
driver's end-of-round bench run reuses it); AFEM_CACHE_DIR overrides.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.environ.get(
    "AFEM_CACHE_DIR", os.path.join(_REPO_ROOT, ".cache", "afem_meshes"))
os.makedirs(CACHE_DIR, exist_ok=True)


def cache_dir() -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    return CACHE_DIR


def cache_path(name: str) -> str:
    return os.path.join(cache_dir(), name)
