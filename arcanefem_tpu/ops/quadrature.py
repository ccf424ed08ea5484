"""Gauss quadrature + isoparametric shape functions for the element zoo.

TPU-native counterpart of the reference's FemShapeMethods + FemGaussQuadrature
+ GaussQuadrature.h tables (femutils/ArcaneFemFunctions.h:1252-2878,
femutils/GaussQuadrature.h) and the Gauss-point precomputation of
GaussDoFsOnCells (femutils/GaussDoFsOnCells.h).

Design inversion: instead of per-cell per-Gauss-point DoF variables, the
shape values N (ng, npc) and reference derivatives dN (ng, npc, rdim) are
*host constants per cell type*; only the Jacobian work is traced, batched
over all cells of a bucket — a handful of small einsums XLA fuses.

Reference elements use gmsh node orderings (meshes come straight from the
gmsh reader).  FEM integrals are invariant to the labeling convention as
long as shape functions are consistent with the connectivity, so parity
with Arcane's conventions is not required.

The pyramid uses the standard rational basis on the square-base pyramid
(base (±1,±1,0), apex (0,0,1)) with a conical-product rule: 2×2
Gauss-Legendre in the collapsed coordinates × 2-point Gauss-Jacobi(2,0)
along the axis (nodes 0.1225148226554413/0.5441518440112253, weights
0.2325474512535077/0.1007858820798256 — the (1−ζ)² base-shrink factor is
the Jacobi weight).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_G1 = 1.0 / np.sqrt(3.0)  # 2-pt Gauss-Legendre node

REF_DIM = {
    "line2": 1, "line3": 1,
    "tria3": 2, "tria6": 2, "quad4": 2, "quad8": 2,
    "tetra4": 3, "tetra10": 3, "hexa8": 3, "hexa20": 3,
    "penta6": 3, "pyramid5": 3,
}

# gmsh corner signs for tensor-product elements
_QUAD_SIGNS = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
_HEX_SIGNS = np.array(
    [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
     [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float64
)

# Gauss-Jacobi(2,0) 2-pt rule on [0,1] for the pyramid axis
_PJ_X = np.array([0.1225148226554413, 0.5441518440112253])
_PJ_W = np.array([0.2325474512535077, 0.1007858820798256])


@lru_cache(maxsize=None)
def rule(cell_type: str, ninteg: int = 2):
    """(points (ng, rdim), weights (ng,)) numpy constants.

    ninteg mirrors the reference's gauss-nint option (default 2,
    modules/passmo/Elastodynamic.axl:448).
    """
    if ninteg != 2:
        raise NotImplementedError("only ninteg=2 rules are wired up so far")
    if cell_type == "line2":
        return np.array([[-_G1], [_G1]]), np.array([1.0, 1.0])
    if cell_type in ("tria3", "tria6"):
        # 3-point edge-midpoint rule, degree 2 (GaussQuadrature.h order 2)
        pts = np.array([[0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
        return pts, np.full(3, 1.0 / 6.0)
    if cell_type in ("quad4", "quad8"):
        pts = np.array([[x, y] for x in (-_G1, _G1) for y in (-_G1, _G1)])
        return pts, np.ones(4)
    if cell_type in ("tetra4", "tetra10"):
        a, b = 0.5854101966249685, 0.1381966011250105
        pts = np.array(
            [[a, b, b], [b, a, b], [b, b, a], [b, b, b]]
        )
        return pts, np.full(4, 1.0 / 24.0)
    if cell_type in ("hexa8", "hexa20"):
        pts = np.array(
            [[x, y, z] for x in (-_G1, _G1) for y in (-_G1, _G1) for z in (-_G1, _G1)]
        )
        return pts, np.ones(8)
    if cell_type == "penta6":
        tri, tw = rule("tria3")
        pts, wts = [], []
        for zi, zw in ((-_G1, 1.0), (_G1, 1.0)):
            for (x, y), w in zip(tri, tw):
                pts.append([x, y, zi])
                wts.append(w * zw)
        return np.array(pts), np.array(wts)
    if cell_type == "pyramid5":
        pts, wts = [], []
        for zi, zw in zip(_PJ_X, _PJ_W):
            s = 1.0 - zi
            for u in (-_G1, _G1):
                for v in (-_G1, _G1):
                    pts.append([u * s, v * s, zi])
                    wts.append(zw)
        return np.array(pts), np.array(wts)
    raise NotImplementedError(f"no quadrature rule for '{cell_type}'")


@lru_cache(maxsize=None)
def shape_tables(cell_type: str, ninteg: int = 2):
    """(N (ng, npc), dN (ng, npc, rdim)) numpy constants at the rule points."""
    pts, _ = rule(cell_type, ninteg)
    return _shape_at(cell_type, pts)


def _shape_at(cell_type: str, pts: np.ndarray):
    ng = pts.shape[0]
    if cell_type == "line2":
        x = pts[:, 0]
        N = np.stack([(1 - x) / 2, (1 + x) / 2], axis=1)
        dN = np.tile(np.array([[-0.5], [0.5]])[None], (ng, 1, 1))
        return N, dN
    if cell_type == "tria3":
        x, y = pts[:, 0], pts[:, 1]
        N = np.stack([1 - x - y, x, y], axis=1)
        dN = np.tile(
            np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])[None], (ng, 1, 1)
        )
        return N, dN
    if cell_type == "quad4":
        x, y = pts[:, 0], pts[:, 1]
        sx, sy = _QUAD_SIGNS[:, 0], _QUAD_SIGNS[:, 1]
        N = 0.25 * (1 + x[:, None] * sx) * (1 + y[:, None] * sy)
        dN = np.stack(
            [0.25 * sx * (1 + y[:, None] * sy), 0.25 * sy * (1 + x[:, None] * sx)],
            axis=2,
        )
        return N, dN
    if cell_type == "tetra4":
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        N = np.stack([1 - x - y - z, x, y, z], axis=1)
        d = np.array(
            [[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64
        )
        return N, np.tile(d[None], (ng, 1, 1))
    if cell_type == "hexa8":
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        sx, sy, sz = _HEX_SIGNS[:, 0], _HEX_SIGNS[:, 1], _HEX_SIGNS[:, 2]
        fx = 1 + x[:, None] * sx
        fy = 1 + y[:, None] * sy
        fz = 1 + z[:, None] * sz
        N = 0.125 * fx * fy * fz
        dN = np.stack(
            [0.125 * sx * fy * fz, 0.125 * sy * fx * fz, 0.125 * sz * fx * fy],
            axis=2,
        )
        return N, dN
    if cell_type == "penta6":
        # gmsh wedge: triangle (x,y) × line z ∈ [−1,1]; nodes 0-2 at z=−1
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        t = np.stack([1 - x - y, x, y], axis=1)  # (ng, 3)
        dt = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        lo, hi = (1 - z) / 2, (1 + z) / 2
        N = np.concatenate([t * lo[:, None], t * hi[:, None]], axis=1)
        dN = np.zeros((ng, 6, 3))
        for k in range(3):
            dN[:, k, :2] = dt[k] * lo[:, None]
            dN[:, 3 + k, :2] = dt[k] * hi[:, None]
            dN[:, k, 2] = -0.5 * t[:, k]
            dN[:, 3 + k, 2] = 0.5 * t[:, k]
        return N, dN
    if cell_type == "pyramid5":
        # rational basis on base (±1,±1,0), apex (0,0,1):
        # N_i = (t1+sx·x)(t1+sy·y)/(4 t1), t1 = 1−z; N_4 = z
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        t1 = 1.0 - z
        sx, sy = _QUAD_SIGNS[:, 0], _QUAD_SIGNS[:, 1]
        fx = t1[:, None] + x[:, None] * sx
        fy = t1[:, None] + y[:, None] * sy
        N = np.concatenate(
            [fx * fy / (4 * t1[:, None]), z[:, None]], axis=1
        )
        dN = np.zeros((ng, 5, 3))
        dN[:, :4, 0] = sx * fy / (4 * t1[:, None])
        dN[:, :4, 1] = sy * fx / (4 * t1[:, None])
        dN[:, :4, 2] = (
            fx * fy / (4 * t1[:, None] ** 2) - (fx + fy) / (4 * t1[:, None])
        )
        dN[:, 4, 2] = 1.0
        return N, dN
    if cell_type == "tria6":
        # gmsh: corners 0-2, midsides 3=(0,1), 4=(1,2), 5=(2,0)
        x, y = pts[:, 0], pts[:, 1]
        L = np.stack([1 - x - y, x, y], axis=1)
        dL = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        edges = [(0, 1), (1, 2), (2, 0)]
        N = np.concatenate(
            [L * (2 * L - 1)]
            + [4 * (L[:, a] * L[:, b])[:, None] for a, b in edges], axis=1
        )
        dN = np.zeros((ng, 6, 2))
        for i in range(3):
            dN[:, i] = (4 * L[:, i, None] - 1) * dL[i]
        for k, (a, b) in enumerate(edges):
            dN[:, 3 + k] = 4 * (L[:, a, None] * dL[b] + L[:, b, None] * dL[a])
        return N, dN
    if cell_type == "tetra10":
        # gmsh: corners 0-3, edges 4=(0,1) 5=(1,2) 6=(0,2) 7=(0,3) 8=(2,3) 9=(1,3)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        L = np.stack([1 - x - y - z, x, y, z], axis=1)
        dL = np.array(
            [[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64
        )
        edges = [(0, 1), (1, 2), (0, 2), (0, 3), (2, 3), (1, 3)]
        N = np.concatenate(
            [L * (2 * L - 1)]
            + [4 * (L[:, a] * L[:, b])[:, None] for a, b in edges], axis=1
        )
        dN = np.zeros((ng, 10, 3))
        for i in range(4):
            dN[:, i] = (4 * L[:, i, None] - 1) * dL[i]
        for k, (a, b) in enumerate(edges):
            dN[:, 4 + k] = 4 * (L[:, a, None] * dL[b] + L[:, b, None] * dL[a])
        return N, dN
    if cell_type == "quad8":
        # serendipity; gmsh midsides 4=(0,1) 5=(1,2) 6=(2,3) 7=(3,0)
        x, y = pts[:, 0], pts[:, 1]
        sx, sy = _QUAD_SIGNS[:, 0], _QUAD_SIGNS[:, 1]
        N = np.zeros((ng, 8))
        dN = np.zeros((ng, 8, 2))
        fx = 1 + x[:, None] * sx
        fy = 1 + y[:, None] * sy
        N[:, :4] = 0.25 * fx * fy * (x[:, None] * sx + y[:, None] * sy - 1)
        dN[:, :4, 0] = 0.25 * sx * fy * (2 * x[:, None] * sx + y[:, None] * sy)
        dN[:, :4, 1] = 0.25 * sy * fx * (x[:, None] * sx + 2 * y[:, None] * sy)
        mids = [(0.0, -1.0), (1.0, 0.0), (0.0, 1.0), (-1.0, 0.0)]
        for k, (mx, my) in enumerate(mids):
            i = 4 + k
            if mx == 0.0:
                N[:, i] = 0.5 * (1 - x * x) * (1 + y * my)
                dN[:, i, 0] = -x * (1 + y * my)
                dN[:, i, 1] = 0.5 * (1 - x * x) * my
            else:
                N[:, i] = 0.5 * (1 + x * mx) * (1 - y * y)
                dN[:, i, 0] = 0.5 * mx * (1 - y * y)
                dN[:, i, 1] = -y * (1 + x * mx)
        return N, dN
    if cell_type == "hexa20":
        # serendipity; gmsh edge order (0,1)(0,3)(0,4)(1,2)(1,5)(2,3)
        # (2,6)(3,7)(4,5)(4,7)(5,6)(6,7)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        sx, sy, sz = _HEX_SIGNS[:, 0], _HEX_SIGNS[:, 1], _HEX_SIGNS[:, 2]
        N = np.zeros((ng, 20))
        dN = np.zeros((ng, 20, 3))
        fx = 1 + x[:, None] * sx
        fy = 1 + y[:, None] * sy
        fz = 1 + z[:, None] * sz
        s = x[:, None] * sx + y[:, None] * sy + z[:, None] * sz
        N[:, :8] = 0.125 * fx * fy * fz * (s - 2)
        dN[:, :8, 0] = 0.125 * sx * fy * fz * (s - 2 + fx)
        dN[:, :8, 1] = 0.125 * sy * fx * fz * (s - 2 + fy)
        dN[:, :8, 2] = 0.125 * sz * fx * fy * (s - 2 + fz)
        hex_edges = [(0, 1), (0, 3), (0, 4), (1, 2), (1, 5), (2, 3),
                     (2, 6), (3, 7), (4, 5), (4, 7), (5, 6), (6, 7)]
        for k, (a, b) in enumerate(hex_edges):
            m = 0.5 * (_HEX_SIGNS[a] + _HEX_SIGNS[b])  # midside coordinate
            comps = np.array([x, y, z])  # (3, ng)
            zero_ax = int(np.where(m == 0)[0][0])
            u = comps[zero_ax]
            quad = 1 - u * u
            lin = np.ones(ng)
            for ax in range(3):
                if ax != zero_ax:
                    lin = lin * (1 + comps[ax] * m[ax])
            i = 8 + k
            N[:, i] = 0.25 * quad * lin
            for ax in range(3):
                if ax == zero_ax:
                    dN[:, i, ax] = 0.25 * (-2 * u) * lin
                else:
                    other = [a2 for a2 in range(3) if a2 not in (zero_ax, ax)][0]
                    dN[:, i, ax] = (
                        0.25 * quad * m[ax] * (1 + comps[other] * m[other])
                    )
        return N, dN
    raise NotImplementedError(f"no shape functions for '{cell_type}'")


def iso_geometry(cell_type: str, xyz: jnp.ndarray, dim: int, ninteg: int = 2):
    """Batched isoparametric geometry at every Gauss point.

    xyz: (nc, npc, 3) vertex coordinates; uses the first `dim` components.
    Returns (N (ng, npc) const, grads (ng, nc, npc, dim), wdet (ng, nc))
    with wdet = w_g · |det J|.
    """
    N, dN = shape_tables(cell_type, ninteg)
    _, w = rule(cell_type, ninteg)
    X = xyz[..., :dim]  # (nc, npc, dim)
    dNj = jnp.asarray(dN.astype(np.asarray(xyz).dtype))
    # J[g,c,r,d] = Σ_n dN[g,n,r] X[c,n,d]
    J = jnp.einsum("gnr,cnd->gcrd", dNj, X)
    detJ = jnp.linalg.det(J)
    # chain rule: ∂N/∂ξ_r = Σ_d (∂N/∂x_d) J[r,d]  ⇒  dN_x[d] = Σ_r (J⁻¹)[d,r] dN_ξ[r]
    grads = jnp.einsum("gcdr,gnr->gcnd", jnp.linalg.inv(J), dNj)
    wdet = jnp.abs(detJ) * jnp.asarray(w.astype(np.asarray(xyz).dtype))[:, None]
    return N, grads, wdet


def stiffness_blocks_iso(
    cell_type: str, xyz: jnp.ndarray, lam, mu, dim: int, ninteg: int = 2
) -> jnp.ndarray:
    """Elasticity blocks Σ_g w·detJ·(λ divdiv + 2μ ε:ε) -> (nc,npc,npc,d,d).

    lam/mu: scalars or (nc,) per-cell arrays (passmo's per-cell material
    variables, modules/passmo ElastodynamicModule.cc m_lambda/m_mu).
    """
    _, grads, wdet = iso_geometry(cell_type, xyz, dim, ninteg)
    lamc = jnp.asarray(lam) * wdet  # (g, c)
    muc = jnp.asarray(mu) * wdet
    t_div = jnp.einsum("gc,gcia,gcjb->cijab", lamc, grads, grads)
    t_eps1 = jnp.einsum("gc,gcib,gcja->cijab", muc, grads, grads)
    dot = jnp.einsum("gc,gcik,gcjk->gcij", muc, grads, grads)
    eye = jnp.eye(dim, dtype=xyz.dtype)
    t_eps2 = jnp.einsum("gcij,ab->cijab", dot, eye)
    return t_div + t_eps1 + t_eps2


def mass_blocks_iso(
    cell_type: str, xyz: jnp.ndarray, rho, dim: int, ninteg: int = 2
) -> jnp.ndarray:
    """Consistent mass blocks Σ_g w·detJ·ρ·N_i N_j · I_d."""
    N, _, wdet = iso_geometry(cell_type, xyz, dim, ninteg)
    Nj = jnp.asarray(N.astype(np.asarray(xyz).dtype))
    rhoc = jnp.asarray(rho) * wdet
    m = jnp.einsum("gc,gi,gj->cij", rhoc, Nj, Nj)
    eye = jnp.eye(dim, dtype=xyz.dtype)
    return m[:, :, :, None, None] * eye[None, None, None]
