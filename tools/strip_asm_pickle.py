"""Strip dead device arrays from cached window-assembler pickles.

Window-mode TetraLaneAssembler pickles written before the lazy
slot_map_t/conn_dev fix carry 16·nc i64 of segsum-only slot map (1.4 GB
at 1.9M nodes) + the (4, nc) conn fallback that the window path never
reads.  Rewrites each matching pickle in-place (atomic tmp+rename) with
those fields dropped.  Runs on the CPU platform so unpickling does not
transfer GBs through the TPU tunnel.

Usage: python tools/strip_asm_pickle.py [glob...]
"""

import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from arcanefem_tpu.utils.cache import CACHE_DIR  # noqa: E402


def main():
    pats = sys.argv[1:] or [os.path.join(CACHE_DIR, "asmplan_*.pkl")]
    for pat in pats:
        for path in sorted(glob.glob(pat)):
            size0 = os.path.getsize(path)
            with open(path, "rb") as f:
                asm = pickle.load(f)
            changed = False
            if getattr(asm, "reducer", None) is not None and \
                    getattr(asm, "slot_map_t", None) is not None:
                asm.slot_map_t = None
                changed = True
            if getattr(asm, "gather", None) is not None and \
                    getattr(asm, "conn_dev", None) is not None:
                asm.conn_dev = None
                changed = True
            if not changed:
                print(f"{path}: already slim ({size0/1e9:.2f} GB)")
                continue
            with open(path + ".tmp", "wb") as f:
                pickle.dump(asm, f, protocol=4)
            os.replace(path + ".tmp", path)
            print(f"{path}: {size0/1e9:.2f} -> "
                  f"{os.path.getsize(path)/1e9:.2f} GB")


if __name__ == "__main__":
    main()
