"""Lane-major tetra assembly — TPU-layout element kernels at scale.

The element-centric layouts of ops/elements.py ((nc, npc, dim) tensors)
are fine at case-study sizes but catastrophic at benchmark scale: TPU
tiles the trailing two axes to (8, 128), so an f32[3, 12.2M, 4]
intermediate pads to 18.7 GB (measured OOM at 2.1M nodes).  Here the CELL
axis is the last (lane) axis everywhere: every intermediate is a (k, nc)
stack of perfectly-tiled vectors, and the whole element computation is one
fused elementwise pass at HBM bandwidth.

Corner coordinates are fetched with the window-planned gather
(sparse/pallas_spmv.PlannedGather) — cells are sorted by min node
(utils/ordering.renumber_mesh), so conn columns are near-monotone and the
gather runs at window-kernel speed instead of XLA's ~0.11 Gelem/s.

Role reference: the CUDA BSR assembly kernels, BSRFormat.h:842-898.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.topology import Topology


class TetraLaneAssembler:
    """Assemble the P1 tetra stiffness into BELL (n, W) values.

    asm = TetraLaneAssembler(topo, mesh); vals = asm(coords)  # (n, W)

    coords: (n, 3) f32 device array.  The gather plan and the transposed
    slot map are built once on the host and ride as pytree-style device
    buffers passed per call (no HLO literals).
    """

    def __init__(self, topo: Topology, conn: np.ndarray,
                 reduce: str | None = None):
        """reduce: "segsum" (XLA scatter, ~0.07 Gelem/s on v5e) or
        "window" (SortedEntryAssembler split window gather); default from
        AFEM_UNSTR_ASM.  Measured v5e @1.9M sphere_cut: window 1.69s vs
        segsum 2.36s (q6_asmwin), so window is the TPU default; CPU keeps
        segsum (no Mosaic plans off-TPU)."""
        import os

        self.topo = topo
        nc = conn.shape[0]
        self.n_cells = nc
        self.gather = None
        self.reducer = None
        on_tpu = jax.devices()[0].platform == "tpu"
        # AFEM_ASM_COMPACT=1: per-block distinct-source pre-gather for BOTH
        # assembly sweeps (coords + reducer) — the direct sweeps re-stream
        # each coord ~cells-per-node times and pay span-sized reducer
        # windows; compaction is the same ~6x lane-op cut the SpMV took
        # (CompactBellSpmv).  DEFAULT ON since round 5: measured 1661.6
        # -> 384.8 ms at 1.9M (reducer 1461.9 -> 308.4, coords 167.7 ->
        # 55.4; tools/probe_asm_phases.py 2026-08-20).  AFEM_ASM_COMPACT=0
        # restores the direct sweeps.
        compact = os.environ.get("AFEM_ASM_COMPACT", "1") == "1"
        self.compact = compact
        if on_tpu:
            from ..sparse.pallas_spmv import PlannedGather

            # CORNER-major request order (row = i*nc + c): corner i's
            # gathered coords are then the static slice out[i*nc:(i+1)*nc]
            # — the old cell-major order needed a (nc, 4) reshape+transpose
            # whose (8,128) tiling pads 4 -> 128 lanes: a 26.7 GB HBM
            # allocation at 52M cells (compile-time OOM on the 8.9M arm,
            # measured 2026-08-20; a silent 5.6 GB at 11M cells).  Window
            # locality per corner is the same near-monotone cell order.
            cdt = np.int32 if topo.n_nodes < 2**31 else np.int64
            cols = np.asarray(conn, cdt).T.reshape(-1, 1)  # (4nc, 1)
            # bool weights = unit plan without a 4nc f32 (834 MB at 8.9M)
            self.gather = PlannedGather.build(
                cols, np.ones((4 * nc, 1), np.bool_), wcap=0,
                compact=compact,
            )
            self.coords_order = "corner"
        if reduce is None:
            reduce = os.environ.get(
                "AFEM_UNSTR_ASM", "window" if on_tpu else "segsum")
        self.reducer_kind = "segsum"
        if reduce == "window" and on_tpu:
            from ..sparse.pallas_assembly import Q2P16, SortedEntryAssembler

            # symmetric packing: ke[i,j] == ke[j,i], so the gather table
            # carries only the 10 upper-triangle entries per tet (id =
            # c*10 + packed(i,j)) — 6/16 less table traffic and denser
            # source windows.  NOTE: plans only on narrow-band (2D)
            # meshes; 3D falls through (ROADMAP "scatter tax").
            # int32 broadcast form: 10·nc < 2^31 for any single-chip mesh,
            # and the i64 arange/div/mod chain was ~5 passes over 16·nc
            edt = np.int32 if 10 * nc < 2**31 else np.int64
            entry_map = (
                (np.arange(nc, dtype=edt) * 10)[:, None]
                + Q2P16[None, :].astype(edt)
            ).reshape(-1)
            sea = SortedEntryAssembler(topo, entry_map=entry_map,
                                       compact=compact)
            if sea.available:
                self.reducer = sea.plan
                self.reducer_kind = "window"
        elif reduce == "reorder" and on_tpu:
            from ..sparse.pallas_assembly import ReorderedAssembler

            ra = ReorderedAssembler(topo, conn)
            if ra.available:
                self.reducer = ra.apply
                self.reducer_kind = "reorder"
        if reduce != "segsum" and self.reducer_kind == "segsum":
            # an A/B run must not silently record segsum timings as the
            # requested strategy's (3D meshes: no window plan exists —
            # ROADMAP "scatter tax")
            import sys

            print(f"lane_assembly: reduce={reduce!r} unavailable on this "
                  "mesh/platform; FALLING BACK to segment_sum",
                  file=sys.stderr, flush=True)
        if compact:
            # self.compact must record whether compaction actually ENGAGED,
            # not merely the request: PlannedGather.build/_build_split_compact
            # silently degrade to non-compact plans, and a "_c" cache key /
            # asm_compact:true bench line describing a non-compact plan
            # corrupts the A/B (ADVICE r3).  Engaged = every requested plan
            # is the chained (pre-gather) form.
            from ..sparse.pallas_spmv import ChainedGather

            engaged = True
            if self.gather is not None and not isinstance(
                    self.gather, ChainedGather):
                engaged = False
            if self.reducer is not None and not isinstance(
                    getattr(self.reducer, "stage1", None), ChainedGather):
                engaged = False
            if not engaged:
                import sys

                print("lane_assembly: AFEM_ASM_COMPACT=1 requested but the "
                      "compact pre-gather DEGRADED to a direct plan; "
                      "recording compact=False", file=sys.stderr, flush=True)
            self.compact = engaged
        # lane-major entry order: e = (i*4+j)*nc + c.  Only the segsum
        # fallback consumes the slot map — with a window reducer it would
        # be 16·nc i64 of DEAD device weight (1.4 GB at 1.9M nodes, 7 GB
        # at 8.9M: enough to OOM the 10M arm) and the same again in the
        # plan pickle + tunnel transfer on every cache load.
        if self.reducer is None:
            sm = np.asarray(topo.slot_maps["tetra4"])  # (nc, 16), cell-major
            # i32 halves the map (3.3 GB at 8.9M); n_slots = N·W < 2^31
            # for every mesh a single chip can hold
            smdt = np.int32 if topo.n_slots < 2**31 else np.int64
            self.slot_map_t = jnp.asarray(
                np.ascontiguousarray(sm.T.astype(smdt)).reshape(-1)
            )
        else:
            self.slot_map_t = None
        # coords fallback when no window plan exists for the gather
        self.conn_dev = (None if self.gather is not None
                         else jnp.asarray(np.asarray(conn, np.int32).T))

    @property
    def available(self) -> bool:
        return True

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        return lane_assemble(self, coords)


def _assemble_impl(coords, conn_dev, slot_map_t, gather, reducer,
                   nc, n, W, n_slots, reducer_kind="segsum",
                   coords_batched=False):
    if gather is not None and coords_batched:
        # one kernel over a (3, n) table stack — the plan arrays stay
        # resident across the x/y/z channels instead of re-streaming
        # (AFEM_ASM_COORDS=batched; A/B'd by tools/probe_asm_phases.py).
        # Corner-major plan rows: corner i = static slice i*nc:(i+1)*nc
        # (no (nc, 4)-minor relayout — 26.7 GB tile-pad at 52M cells)
        g3 = gather.call_batched(coords.T)  # (3, 4nc)
        x = [g3[0, i * nc:(i + 1) * nc] for i in range(4)]
        y = [g3[1, i * nc:(i + 1) * nc] for i in range(4)]
        z = [g3[2, i * nc:(i + 1) * nc] for i in range(4)]
    elif gather is not None:
        ox = gather(coords[:, 0])
        oy = gather(coords[:, 1])
        oz = gather(coords[:, 2])
        x = [ox[i * nc:(i + 1) * nc] for i in range(4)]
        y = [oy[i * nc:(i + 1) * nc] for i in range(4)]
        z = [oz[i * nc:(i + 1) * nc] for i in range(4)]
    else:
        xg = coords[:, 0][conn_dev]
        yg = coords[:, 1][conn_dev]
        zg = coords[:, 2][conn_dev]
        x = [xg[i] for i in range(4)]
        y = [yg[i] for i in range(4)]
        z = [zg[i] for i in range(4)]

    # 6V = (p1-p0) . (p2-p0) x (p3-p0)
    ax, ay, az = x[1] - x[0], y[1] - y[0], z[1] - z[0]
    bx, by, bz = x[2] - x[0], y[2] - y[0], z[2] - z[0]
    cx, cy, cz = x[3] - x[0], y[3] - y[0], z[3] - z[0]
    v6 = ax * (by * cz - bz * cy) + ay * (bz * cx - bx * cz) + az * (
        bx * cy - by * cx
    )
    v6a = jnp.abs(v6)
    inv = 1.0 / v6a

    def comp(u, w):
        # cofactor rows (ArcaneFemFunctions.h:690-816 pattern)
        return [
            u[1] * (w[3] - w[2]) + u[2] * (w[1] - w[3]) + u[3] * (w[2] - w[1]),
            u[0] * (w[2] - w[3]) + u[2] * (w[3] - w[0]) + u[3] * (w[0] - w[2]),
            u[0] * (w[3] - w[1]) + u[1] * (w[0] - w[3]) + u[3] * (w[1] - w[0]),
            u[0] * (w[1] - w[2]) + u[1] * (w[2] - w[0]) + u[2] * (w[0] - w[1]),
        ]

    dx = comp(y, z)
    dy = comp(z, x)
    dz = comp(x, y)
    # ke_ij = V * (dx_i dx_j + dy_i dy_j + dz_i dz_j) / (6V)^2; V = |6V|/6
    scale = inv / 6.0  # |6V| / 6 / |6V|^2
    if reducer is not None:
        # symmetric: only the 10 upper-triangle entries (ke[i,j]=ke[j,i])
        ke10 = jnp.stack(
            [
                (dx[i] * dx[j] + dy[i] * dy[j] + dz[i] * dz[j]) * scale
                for i in range(4)
                for j in range(i, 4)
            ]
        )  # (10, nc)
        if reducer_kind == "reorder":
            # per-ordered-pair streams straight off the lane-major stack
            return reducer(ke10)
        # cell-major flat via one HBM transpose pass, then the split
        # window gather — scatter-free reduction
        return reducer(ke10.T.reshape(-1)).reshape(n, W)
    # one scatter-add per (i, j) entry instead of a stacked (16, nc)
    # ke + single segment_sum: the stack alone is 3.3 GB at 52M cells and
    # its flat reshape doubles it — the 8.9M segsum arm OOM'd 16 GB HBM
    # (measured 2026-08-20).  Total scattered elements are identical and
    # the scatter is issue-bound, so 16 calls cost the same.
    vals = jnp.zeros(n_slots, jnp.float32)
    for q, (i, j) in enumerate(
        [(i, j) for i in range(4) for j in range(4)]
    ):
        keq = (dx[i] * dx[j] + dy[i] * dy[j] + dz[i] * dz[j]) * scale
        vals = vals.at[
            jax.lax.slice_in_dim(slot_map_t, q * nc, (q + 1) * nc)
        ].add(keq)
    return vals.reshape(n, W)


def _lane_assemble_jit():
    return jax.jit(
        _assemble_impl,
        static_argnames=("nc", "n", "W", "n_slots", "reducer_kind",
                         "coords_batched"),
    )


_jitted = None


def lane_assemble(asm: TetraLaneAssembler, coords: jnp.ndarray):
    global _jitted
    if _jitted is None:
        _jitted = _lane_assemble_jit()
    t = asm.topo
    import os

    return _jitted(
        coords.astype(jnp.float32), asm.conn_dev, asm.slot_map_t,
        asm.gather, asm.reducer, nc=asm.n_cells, n=t.n_nodes, W=t.width,
        n_slots=t.n_slots, reducer_kind=asm.reducer_kind,
        coords_batched=os.environ.get("AFEM_ASM_COORDS") == "batched",
    )
