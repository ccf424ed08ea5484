"""Blocked (b×b) window-sweep SpMV for SCALAR sparse operators.

**RETIRED (round 5) — documented negative result.**  With the shared
probe/bench harness (utils/timing.py) block4_w16 measured 23.8 ms vs the
production split-compact chain's 14.0 ms on the 1.9M sphere_cut: the b
channel tables multiply the pre/post stages back past anything the b×b
sweep reduction saves, across two rounds of layout fixes (stage-3 MXU
row sums, (nb, b, R) reshapes).  The AFEM_SPMV=blockN routing has been
removed from bench.py/solver/amg.py; the class stays importable for the
record and its parity tests.

The window kernel's cost is (entry tiles) × (window rows): every 128-lane
tile of gather indices is swept against every 128-lane row of its block's
VMEM window (sparse/pallas_spmv.py).  Both factors shrink when the
operator is swept at b×b BLOCK granularity over b channel tables:

* one gather index serves b·b scalar entries (the index stream and the
  entry-tile count divide by ~b²/fill);
* the window covers block columns — 1/b as many rows of x per channel.

Per-channel sweep ≈ (nnz·fill/b² / 128) × (VL/b), times b channels:
**lane-ops ratio ≈ fill/b² vs the scalar ELL sweep** (fill = stored
block entries × b² / nnz).  Measured on the 1.9M sphere_cut (sn order):
fill(b=2)=2.51, fill(b=4)=5.67 → model ratios 0.63 / 0.35, before the
CSR-split win (the scalar fine ELL sweep also pays W=25 padding ≈ 1.7×;
the blocked form splits subrows at wcap and pays only ceil-padding).

The trade: values ride as dense (E_b, b, b) blocks — fill× more value
bytes.  At 750 GB/s that stream is ~1 ms of the 13.6 ms 1.9M fine SpMV,
while the sweep is the bottleneck, so the trade is right for b ≤ 4.

This is the TPU answer to the reference's BSR block format
(femutils/BSRFormat.h:104-336) applied to SCALAR systems: there the
blocks amortize CUDA index arithmetic; here they amortize the Mosaic
window sweep.

Numerics: identical linear map to the scalar operator (absent scalar
entries inside a stored block carry exact 0.0); per-row sums associate
channel-major then slot-major — bit-different from the scalar kernel but
the same f32 class of association as every other path here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_spmv import (
    LANE,
    PlannedGather,
    _adaptive_block_rows,
    _compact_columns,
    _products_b_unit,
    _split_stage2,
)


class BlockedGather:
    """Baked-values blocked SpMV: ``y = A @ x`` for a scalar CSR A.

    Build with :meth:`build_csr`; None when any stage cannot be
    window-planned (caller falls back to the scalar kernel).  Registered
    pytree (device arrays as leaves) so it rides inside jitted solvers
    and pickles with the AMG hierarchy cache.
    """

    def __init__(self, pre, lcols2, lo2, key2, vals_tiled, stage3,
                 b, wcap, n_rows, n_cols, need_rows2):
        self.pre = pre  # stage-0 PlannedGather (distinct block cols)
        self.lcols2 = lcols2  # stage-2 main-sweep plan arrays
        self.lo2 = lo2
        self.key2 = key2  # (G, slot_rows, nb) static
        self.vals_tiled = vals_tiled  # (nb, b, b, G, LANE) f32
        self.stage3 = stage3  # subrow-sum PlannedGather (unit weights)
        self.b = b
        self.wcap = wcap
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.need_rows2 = need_rows2

    @staticmethod
    def build_csr(indices: np.ndarray, indptr: np.ndarray,
                  data: np.ndarray, n_cols: int | None = None,
                  b: int = 4, wcap: int = 8,
                  max_window: int = 128 * 1024,
                  block_rows: int | None = None):
        """Scalar CSR (indices/indptr/data) → blocked operator or None.

        b: block size (rows AND columns; 2 or 4 keep the fill tolerable
        on RCM/sn-ordered meshes).  wcap: block-row subrow width (must
        divide 128).  block_rows: subrows per main-sweep block — compact
        window height grows ~linearly with the scalar span covered, so
        SMALLER blocks sweep less (until the per-block boundary band or
        the stage-0 duplication dominates); default via
        _adaptive_block_rows.
        """
        if LANE % wcap:
            raise ValueError("wcap must divide 128")
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        data = np.asarray(data, np.float32)
        n = len(indptr) - 1
        if n_cols is None:
            n_cols = int(indices.max()) + 1 if len(indices) else n
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        Nb = -(-n // b)
        Ncb = -(-n_cols // b)
        key = (rows // b) * np.int64(Ncb) + indices // b
        uk, inv = np.unique(key, return_inverse=True)
        Eb = len(uk)
        bI = (uk // Ncb).astype(np.int64)
        bJ = (uk % Ncb).astype(np.int64)
        deg_b = np.bincount(bI, minlength=Nb)
        # block values, scalar (i,j) -> (block, i%b, j%b); CSR entries are
        # unique so plain assignment is a faithful scatter
        bvals = np.zeros((Eb, b, b), np.float32)
        bvals[inv, (rows % b), (indices % b)] = data

        # subrow split of the block rows (wcap entries per subrow); empty
        # block rows keep one padding subrow so stage-3 indexing stays
        # dense
        nsub = np.maximum(1, -(-deg_b // wcap))
        total = int(nsub.sum())
        sub_start = np.concatenate([[0], np.cumsum(nsub)])
        ent_start = np.concatenate([[0], np.cumsum(deg_b)])
        pos = np.arange(Eb, dtype=np.int64) - np.repeat(
            ent_start[:-1], deg_b)
        sub_idx = np.repeat(sub_start[:-1], deg_b) + pos // wcap
        slot = pos % wcap
        s_cols = np.full((total, wcap), -1, np.int64)
        s_cols[sub_idx, slot] = bJ
        s_valid = s_cols >= 0

        # stage 0: per-main-block distinct block columns, pre-gathered per
        # channel (the CompactBellSpmv trick in block space)
        R1 = block_rows or _adaptive_block_rows(wcap)
        if (R1 * wcap) % 128:
            raise ValueError("block_rows*wcap must be a multiple of 128")
        pre, remap = _compact_columns(
            np.where(s_valid, s_cols, 0), s_valid, R1,
            max_window=max_window)
        if pre is None:
            return None
        # stage 2: the main sweep over compact window-local indices
        pg2 = PlannedGather.build(
            remap, s_valid.astype(np.float32), block_rows=R1,
            max_window=max_window, wcap=0)
        if pg2 is None:
            return None
        G, slot_rows, nb = pg2.key
        R = G * LANE // wcap  # subrows per main block
        # bake the block values in the subrow-slot tile layout
        sv = np.zeros((nb * R, wcap, b, b), np.float32)
        sv[sub_idx, slot] = bvals
        vals_tiled = jnp.asarray(
            np.ascontiguousarray(
                sv.reshape(nb, G, LANE, b, b).transpose(0, 3, 4, 1, 2)
            )
        )
        stage3 = _split_stage2(Nb, nsub, total, None, max_window)
        if stage3 is None:
            return None
        return BlockedGather(
            pre=pre, lcols2=pg2.lcols, lo2=pg2.lo, key2=pg2.key,
            vals_tiled=vals_tiled, stage3=stage3, b=b, wcap=wcap,
            n_rows=n, n_cols=n_cols, need_rows2=pg2.need_rows,
        )

    def __call__(self, x: "jnp.ndarray") -> "jnp.ndarray":
        b, wcap = self.b, self.wcap
        G, _, nb = self.key2
        # channel tables: x viewed as (Ncb, b) -> (b, Ncb)
        Ncb = -(-self.n_cols // b)
        xf = x.astype(jnp.float32)
        xn = jnp.pad(xf, (0, Ncb * b - self.n_cols)).reshape(Ncb, b).T
        # stage 0: compact per-block distinct block columns, per channel
        xc = self.pre.call_batched(xn)  # (b, n_compact)
        need = self.need_rows2 * LANE
        n_c = -(-max(int(xc.shape[1]), need) // LANE) * LANE
        xs = jnp.pad(xc, ((0, 0), (0, n_c - xc.shape[1])))
        xs = xs.reshape(b, n_c // LANE, LANE)
        # stage 2: the blocked main sweep (unit gathers, b channels)
        prods = _products_b_unit(self.lcols2, self.lo2, xs, self.key2)
        # (nb, c, G, LANE) × (nb, r, c, G, LANE) -> (nb, r, G, LANE)
        # precision=HIGHEST: default TPU f32 contractions quantize the
        # operands to bf16 — this is the CG fine operator under
        # AFEM_SPMV=blockN, and the contraction size is only b (ADVICE r4)
        part = jnp.einsum(
            "ncgl,nrcgl->nrgl", prods,
            self.vals_tiled.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # row sums over the wcap-wide subrow slots via lane selection
        # (the _row_sums MXU trick, extra r axis; precision=HIGHEST —
        # default matmuls quantize f32 operands to bf16)
        k = LANE // wcap
        sel = jnp.asarray(np.repeat(np.eye(k, dtype=np.float32), wcap, 0))
        s = jnp.einsum("nrgl,lk->nrgk", part, sel,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        # (nb, r, G, k) -> (r, total_pad) WITHOUT a (..., b)-minor
        # intermediate: a trailing axis of b tile-pads b -> 128 lanes
        # (32x relayout bloat at b=4 — same class as the _row_sums 26 GB
        # reshape bomb).  G·k = R subrow slots per block, contiguous.
        R = G * LANE // wcap
        subs_t = s.reshape(nb, b, R).transpose(1, 0, 2).reshape(b, nb * R)
        # stage 3: per-block-row subrow sums, batched over the r channels
        yb = self.stage3.call_batched(subs_t)  # (b, Nb)
        # interleave back to scalar dof order, again lane-minor: pad Nb
        # to a 128 multiple, (b, Nb) -> (b, m, 128) -> (m, 128, b) is
        # still b-minor; instead write y as (Nb, b) via one transpose of
        # the SMALL (b, Nb) array and let XLA fuse the flatten
        y = yb.T.reshape(-1)[: self.n_rows]
        return y.astype(x.dtype)

    def with_weights_dtype(self, dtype) -> "BlockedGather":
        """Same plan, block values cast (bf16 halves the value stream;
        the channel contraction up-casts back to f32 before multiply).
        Keeps the _PlannedMat/with_bf16_vcycle protocol that every gather
        in an AMG hierarchy must satisfy (ADVICE r4)."""
        return BlockedGather(
            pre=self.pre, lcols2=self.lcols2, lo2=self.lo2,
            key2=self.key2, vals_tiled=self.vals_tiled.astype(dtype),
            stage3=self.stage3, b=self.b, wcap=self.wcap,
            n_rows=self.n_rows, n_cols=self.n_cols,
            need_rows2=self.need_rows2,
        )

    def emulate(self, x: np.ndarray) -> np.ndarray:
        """Numpy plan-emulation of the full pipeline (CPU tests)."""
        from ..utils.emulate import emulate_gather

        b, wcap = self.b, self.wcap
        G, _, nb = self.key2
        Ncb = -(-self.n_cols // b)
        xn = np.pad(np.asarray(x, np.float32),
                    (0, Ncb * b - self.n_cols)).reshape(Ncb, b).T
        xc = np.stack([emulate_gather(self.pre, ch) for ch in xn])
        R = G * LANE // wcap
        vt = np.asarray(self.vals_tiled)  # (nb, b, b, G, LANE)
        sv = vt.transpose(0, 3, 4, 1, 2).reshape(nb * R, wcap, b, b)
        # stage-2 emulation: gather per channel at the plan's recovered
        # compact indices
        lc = np.asarray(self.lcols2).reshape(nb, G * LANE)
        from .pallas_spmv import _UNIT_PAD

        offs = [0]
        subs = np.zeros((nb * R, b), np.float64)
        # reconstruct per-block window starts from lo2 + slot rows
        lo = np.asarray(self.lo2)
        slot_rows = self.key2[1]
        so = np.concatenate([[0], np.cumsum(slot_rows)])
        for bi in range(nb):
            v = lc[bi].astype(np.int64)
            pad = v >= int(_UNIT_PAD)
            v0 = np.where(pad, 0, v)
            vrow, lane = v0 >> 7, v0 & (LANE - 1)
            si = np.searchsorted(so, vrow, side="right") - 1
            g = lo[bi][si] + vrow - so[si]
            gl = np.where(pad, -1, g * LANE + lane)
            got = np.zeros((b, G * LANE), np.float64)
            for c in range(b):
                tab = xc[c]
                ok = (gl >= 0) & (gl < len(tab))
                got[c, ok] = tab[gl[ok]]
            # multiply by block values, sum channels, then wcap slots
            w = sv[bi * R:(bi + 1) * R].reshape(G * LANE // wcap, wcap,
                                                b, b)
            gg = got.T.reshape(G * LANE // wcap, wcap, b)
            subs[bi * R:(bi + 1) * R] += np.einsum(
                "swc,swrc->sr", gg, w.astype(np.float64))
        del offs
        yb = np.stack([
            emulate_gather(self.stage3, subs[:, r]) for r in range(b)
        ])
        return yb.T.reshape(-1)[: self.n_rows]


def _blocked_flatten(g):
    return (
        (g.pre, g.lcols2, g.lo2, g.vals_tiled, g.stage3),
        (g.key2, g.b, g.wcap, g.n_rows, g.n_cols, g.need_rows2),
    )


def _blocked_unflatten(meta, data):
    return BlockedGather(
        pre=data[0], lcols2=data[1], lo2=data[2], key2=meta[0],
        vals_tiled=data[3], stage3=data[4], b=meta[1], wcap=meta[2],
        n_rows=meta[3], n_cols=meta[4], need_rows2=meta[5],
    )


jax.tree_util.register_pytree_node(
    BlockedGather, _blocked_flatten, _blocked_unflatten
)
