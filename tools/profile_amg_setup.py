"""Phase-profile the host-side AMG setup on the REAL bench system (CPU).

Loads the cached sn-ordered mesh + topology, assembles the penalty-BC'd
fine operator with numpy (exactly bench_unstructured's system), and runs
build_amg under AFEM_AMG_VERBOSE=1 on the CPU platform so the scipy
pipeline (strength → aggregation → smoothed P → Galerkin → rho) is timed
per level WITHOUT the TPU plan builds.  This is the 206-s setup the
round-3 verdict flagged (#8: reference HypreSetup is 0.5-1.5 s at 10M,
HypreDoFLinearSystem.cc:730).

Usage: JAX_PLATFORMS=cpu python tools/profile_amg_setup.py [key]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["AFEM_AMG_VERBOSE"] = "1"

KEY = sys.argv[1] if len(sys.argv) > 1 else "sphere_cut_v3_h5_r2"


def main():
    import jax

    # the JAX_PLATFORMS env var is IGNORED once the axon plugin registers;
    # the config update is the only reliable CPU pin (verify SKILL.md).
    # Without it A.values lives on the TPU and build_amg's host fetch
    # crawls through the tunnel (~330 s for 189 MB, measured).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from arcanefem_tpu.sparse.bell import BellMatrix
    from arcanefem_tpu.sparse.topology import Topology

    t0 = time.time()
    zm = np.load(f".cache/afem_meshes/{KEY}_snmesh.npz")
    zt = np.load(f".cache/afem_meshes/topo_{KEY}_sn.npz")
    coords, tets = zm["coords"], zm["tets"]
    n = int(zt["n_nodes"])
    W = int(zt["width"])
    topo = Topology(
        n_nodes=n, width=W, ell_cols=zt["ell_cols"],
        ell_valid=zt["ell_valid"], row_ptr=zt["row_ptr"],
        csr_cols=zt["csr_cols"], csr_to_ell=zt["csr_to_ell"],
        diag_slot=zt["diag_slot"], slot_maps={"tetra4": zt["slot_tetra4"]},
    )
    print(f"load {time.time()-t0:.1f}s  n={n:,}", flush=True)

    # P1 tetra stiffness, vectorized numpy (the segsum path, host-side)
    t0 = time.time()
    pc = coords[tets]  # (nc, 4, 3)
    v = pc[:, 1:] - pc[:, :1]
    nrm = np.cross(v[:, [1, 2, 0]], v[:, [2, 0, 1]])  # opposite-face normals
    vol6 = np.einsum("ij,ij->i", v[:, 0], np.cross(v[:, 1], v[:, 2]))
    g = np.empty((len(tets), 4, 3))
    g[:, 1:] = nrm / vol6[:, None, None]
    g[:, 0] = -g[:, 1:].sum(axis=1)
    vols = np.abs(vol6) / 6.0
    ke = np.einsum("cid,cjd->cij", g, g) * vols[:, None, None]
    print(f"ke {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    vals = np.zeros(n * W, np.float32)
    np.add.at(vals, zt["slot_tetra4"].reshape(-1),
              ke.reshape(-1).astype(np.float32))
    print(f"segsum {time.time()-t0:.1f}s", flush=True)

    penalty = np.float32(1.0e12)
    mask = np.zeros(n, bool)
    mask[np.unique(zm["cut"])] = True
    mask[np.unique(zm["sphere"])] = True
    vals[zt["diag_slot"][mask]] = penalty

    A = BellMatrix(
        values=jnp.asarray(vals.reshape(n, W, 1, 1)),
        topo=topo, block=1, cols=jnp.asarray(zt["ell_cols"]),
    )

    from arcanefem_tpu.solver.amg import build_amg

    t0 = time.time()
    M = build_amg(A, smoother="chebyshev", cheb_deg=2, theta=0.03,
                  use_pallas=False, values_np=vals)
    print(f"build_amg TOTAL {time.time()-t0:.1f}s  "
          f"levels={[m.topo.n_nodes for m in M.mats]}", flush=True)


if __name__ == "__main__":
    main()
