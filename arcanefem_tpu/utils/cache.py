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


def _default_cache_dir() -> str:
    """Repo-local .cache when the tree is writable (the dev/driver case);
    ~/.cache/afem otherwise (installed/site-packages or read-only checkout).
    No import-time mkdir — cache_dir() creates lazily (ADVICE r3)."""
    d = os.path.join(_REPO_ROOT, ".cache", "afem_meshes")
    if os.path.isdir(d) or os.access(_REPO_ROOT, os.W_OK):
        return d
    return os.path.join(os.path.expanduser("~"), ".cache", "afem")


CACHE_DIR = os.environ.get("AFEM_CACHE_DIR", _default_cache_dir())


def cache_dir() -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    return CACHE_DIR


def cache_path(name: str) -> str:
    return os.path.join(cache_dir(), name)
