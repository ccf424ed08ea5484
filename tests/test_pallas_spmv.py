"""Pallas window SpMV: host-side plan logic (CPU) + kernel (TPU only).

The kernel itself needs real TPU hardware (Mosaic dynamic_gather); on CPU
we validate the window plan geometry and the RCM ordering that feeds it.
TPU runs are covered by the driver's bench/verify flows.
"""

import numpy as np
import pytest

import jax

from arcanefem_tpu.mesh.generate import rect_tria_mesh
from arcanefem_tpu.sparse.pallas_spmv import LANE, plan_windows
from arcanefem_tpu.sparse.topology import build_topology
from arcanefem_tpu.utils.ordering import rcm_order, renumber_mesh


def _rcm_mesh(n=60):
    mesh = rect_tria_mesh(n, n)
    t = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    return renumber_mesh(mesh, rcm_order(mesh.n_nodes, t.row_ptr, t.csr_cols))


def test_rcm_reduces_bandwidth():
    mesh = rect_tria_mesh(60, 60)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    bw0 = np.abs(
        t0.ell_cols - np.arange(mesh.n_nodes)[:, None]
    ).max()
    mesh2 = renumber_mesh(mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols))
    t1 = build_topology(mesh2.n_nodes, mesh2.cells)
    bw1 = np.abs(t1.ell_cols - np.arange(mesh2.n_nodes)[:, None]).max()
    assert bw1 <= bw0
    assert bw1 < 3 * 61  # ~O(sqrt(N)) for a grid


def test_rcm_solution_invariant():
    """Renumbering must not change the physics (golden-keyed by uid)."""
    from arcanefem_tpu.fem.bcs import BoundaryConditions, DirichletBC
    from arcanefem_tpu.models import poisson

    bcs = BoundaryConditions(
        dirichlet=[DirichletBC("left", 0.0), DirichletBC("right", 1.0)]
    )
    cfg = poisson.PoissonConfig(f=1.0, bcs=bcs)
    mesh = rect_tria_mesh(12, 9)
    r0 = poisson.solve(mesh, cfg)
    t = build_topology(mesh.n_nodes, mesh.cells)
    perm = rcm_order(mesh.n_nodes, t.row_ptr, t.csr_cols)
    r1 = poisson.solve(renumber_mesh(mesh, perm), cfg)
    # new-order node i corresponds to old node perm[i]
    np.testing.assert_allclose(r0.u[perm], r1.u, rtol=1e-9, atol=1e-12)


def test_window_plan_geometry():
    mesh = _rcm_mesh()
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    plan = plan_windows(topo, block_rows=512)
    assert plan is not None
    assert plan.window % (8 * LANE) == 0
    n, W = topo.n_nodes, topo.width
    nb, R = plan.n_blocks, plan.block_rows
    assert nb * R >= n
    # every localized column must be inside its block's window, except
    # pad-row entries, which the native planner marks with the _UNIT_PAD
    # sentinel (the sweep's row-match select zeroes them; the numpy
    # planner filled them with a valid nearby column instead)
    from arcanefem_tpu.sparse.pallas_spmv import _UNIT_PAD

    assert plan.lcols.min() >= 0
    in_win = plan.lcols < plan.window
    is_pad = plan.lcols >= _UNIT_PAD
    assert bool(np.all(in_win | is_pad))
    # real rows carry no sentinel
    assert not is_pad.reshape(nb * R, W)[:n].any()
    # reconstruction through the slot layout == original cols (real rows)
    rec = plan.global_cols()[:n]
    np.testing.assert_array_equal(rec, topo.ell_cols)


def test_compact_spmv_plan_linear_map():
    """CompactBellSpmv's two-stage plan encodes exactly A@x: emulate
    stage 1 (x[uniq]) with the PlannedGather plan and stage 2 with the
    remapped window plan, compare against the dense operator."""
    from arcanefem_tpu.sparse.bell import assemble_bell
    from arcanefem_tpu.sparse.pallas_spmv import CompactBellSpmv

    mesh = _rcm_mesh(40)
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    sp = CompactBellSpmv(topo)
    assert sp.available
    n, W = topo.n_nodes, topo.width
    rng = np.random.RandomState(3)
    vals = rng.randn(n, W).astype(np.float32)
    vals[~np.asarray(topo.ell_valid, bool).reshape(n, W)] = 0.0
    x = rng.randn(n).astype(np.float32)
    # stage 1: compact table
    xc = _emulate_planned(sp._pg1, x)
    assert len(xc) == sp._n_compact
    # stage 2: window sweep over compact indices
    p2 = sp.plan2
    nb, R = p2.n_blocks, p2.block_rows
    gcols = p2.global_cols()  # indices into the compact table
    xc_pad = np.zeros(max(sp._n_compact, gcols.max() + 1), np.float32)
    xc_pad[: len(xc)] = xc
    vp = np.zeros((nb * R, W), np.float32)
    vp[:n] = vals
    y = (vp * xc_pad[gcols]).sum(axis=1)[:n]
    ref = (vals * x[np.asarray(topo.ell_cols)]).sum(axis=1)
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=1e-5)
    # stage-2 windows must never exceed the direct plan's (on 2D meshes
    # distinct-column count ≈ span so they tie; the 6.1x shrink is a 3D
    # effect — measured 352 -> 32 rows on the 2.1M sphere_cut plan)
    direct = plan_windows(topo, block_rows=p2.block_rows)
    assert sum(p2.slot_rows) <= sum(direct.slot_rows)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_kernel_matches_xla_on_tpu():
    import jax.numpy as jnp

    from arcanefem_tpu.ops import elements
    from arcanefem_tpu.sparse.pallas_spmv import PallasBellSpmv

    mesh = _rcm_mesh(120)
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    sp = PallasBellSpmv(topo)
    assert sp.available
    coords = jnp.asarray(mesh.coords.astype(np.float32))
    ke = elements.stiffness_tria3(coords[jnp.asarray(mesh.cells["tria3"])])
    vals = jax.ops.segment_sum(
        ke.reshape(-1), jnp.asarray(topo.slot_maps["tria3"].reshape(-1)),
        num_segments=topo.n_slots,
    ).reshape(topo.n_nodes, topo.width)
    x = jnp.asarray(np.random.RandomState(0).rand(mesh.n_nodes).astype(np.float32))
    y = np.asarray(sp(vals, x))
    yref = np.asarray(jnp.sum(vals * x[jnp.asarray(topo.ell_cols)], axis=1))
    np.testing.assert_allclose(y, yref, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_compact_spmv_matches_window_on_tpu():
    """Two-stage compaction must be the same linear map on hardware."""
    import jax.numpy as jnp

    from arcanefem_tpu.sparse.pallas_spmv import (
        CompactBellSpmv, PallasBellSpmv)

    mesh = _rcm_mesh(120)
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    sp_w = PallasBellSpmv(topo)
    sp_c = CompactBellSpmv(topo)
    assert sp_w.available and sp_c.available
    n, W = topo.n_nodes, topo.width
    rng = np.random.RandomState(7)
    vals = rng.randn(n, W).astype(np.float32)
    vals[~np.asarray(topo.ell_valid, bool).reshape(n, W)] = 0.0
    vals = jnp.asarray(vals)
    x = jnp.asarray(rng.rand(n).astype(np.float32))
    yw = np.asarray(sp_w(vals, x))
    yc = np.asarray(sp_c(vals, x))
    np.testing.assert_allclose(yc, yw, rtol=1e-6, atol=1e-6)


def test_run_case_rcm_golden():
    """run_case(rcm=True) still validates against the uid-keyed golden."""
    from arcanefem_tpu.fem.runner import run_case

    r = run_case(
        "/root/reference/modules/poisson/inputs/circle.2D.arc",
        rcm=True, spmv="pallas",  # pallas falls back off-TPU
    )
    assert r.iterations > 0


def test_assembler_plan_and_mask():
    """Host-side plan of the Pallas gather assembly (kernel is TPU-only)."""
    from arcanefem_tpu.sparse.pallas_assembly import PallasAssembler

    mesh = _rcm_mesh(40)
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    asm = PallasAssembler(topo)
    assert asm.available
    # every real (slot, k) pair maps to a distinct entry; masked count
    # equals the total number of element entries
    assert int(asm.mask.sum()) == sum(
        m.size for m in topo.slot_maps.values()
    )
    # window-local sources reconstruct the global ones
    plan = asm.plan
    n = topo.n_slots
    rec = plan.global_cols()[:n]
    real = asm.mask.astype(bool)
    # each real source index is within the entry array
    E = sum(m.size for m in topo.slot_maps.values())
    assert rec[real].min() >= 0 and rec[real].max() < E


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_assembler_matches_segment_sum_on_tpu():
    import jax.numpy as jnp

    from arcanefem_tpu.ops import elements
    from arcanefem_tpu.sparse.pallas_assembly import PallasAssembler

    mesh = _rcm_mesh(80)
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    asm = PallasAssembler(topo)
    assert asm.available
    coords = jnp.asarray(mesh.coords.astype(np.float32))
    ke = elements.stiffness_tria3(coords[jnp.asarray(mesh.cells["tria3"])])
    got = np.asarray(asm({"tria3": ke}))
    ref = np.asarray(jax.ops.segment_sum(
        ke.reshape(-1), jnp.asarray(topo.slot_maps["tria3"].reshape(-1)),
        num_segments=topo.n_slots,
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-6)


from arcanefem_tpu.utils.emulate import (  # noqa: E402
    emulate_gather as _emulate,
    emulate_planned as _emulate_planned,
)


def test_native_planner_matches_numpy():
    """planner.cpp vs the numpy planner: identical gather RESULTS (the
    layouts may differ in gap tie-breaks — both are valid plans)."""
    from arcanefem_tpu.sparse import pallas_spmv as ps
    from arcanefem_tpu.utils.native import library

    if library() is None or not hasattr(library(), "afem_plan_build"):
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(7)
    n, W = 3000, 8
    cols = (np.arange(n)[:, None] * 4 + rng.randint(0, 600, (n, W))) % (4 * n)
    w = rng.rand(n, W).astype(np.float32)
    w[rng.rand(n, W) < 0.25] = 0.0          # weighted plan with pads
    w_unit = (w != 0).astype(np.float32)    # unit plan with pads
    table = rng.rand(4 * n).astype(np.float32)
    # CSR split form (wide rows) exercises the native subrow layout
    deg = rng.randint(0, 30, 500)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    idx = rng.randint(0, 4 * n, indptr[-1])

    import os
    got, want = {}, {}
    for tag, store in (("1", got), ("0", want)):
        os.environ["AFEM_NATIVE_PLAN"] = tag
        try:
            g = ps.PlannedGather.build(cols, w)
            store["weighted"] = _emulate(g, table)
            gu = ps.PlannedGather.build(cols, w_unit)
            store["unit"] = _emulate(gu, table)
            gc = ps.PlannedGather.build_csr(idx, indptr, wcap=8)
            store["csr"] = _emulate(gc, table)
            pw = ps.plan_windows_from_cols(cols.astype(np.int32), 4 * n - 1)
            store["rec"] = pw.global_cols()[:n]
        finally:
            os.environ.pop("AFEM_NATIVE_PLAN", None)
    np.testing.assert_allclose(got["weighted"], want["weighted"],
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(got["unit"], want["unit"],
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(got["csr"], want["csr"],
                               rtol=2e-5, atol=1e-5)
    # real-row reconstruction is layout-independent
    np.testing.assert_array_equal(got["rec"], want["rec"])


def test_planned_gather_plain():
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather, PlannedGather

    rng = np.random.RandomState(0)
    n, W = 2000, 8
    cols = (np.arange(n)[:, None] * 3 + rng.randint(0, 40, (n, W))) % (3 * n)
    w = rng.rand(n, W).astype(np.float32)
    w[rng.rand(n, W) < 0.3] = 0.0
    g = PlannedGather.build(cols, w)
    assert g is not None and not isinstance(g, ChainedGather)
    table = rng.rand(3 * n).astype(np.float32)
    np.testing.assert_allclose(
        _emulate(g, table), (w * table[cols]).sum(axis=1),
        rtol=2e-5, atol=1e-5,
    )


def test_planned_gather_split_wide_rows():
    """Rows wider than wcap split into a two-stage chained gather (the
    restriction-P^T shape that OOM'd as a single G=544 kernel)."""
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather, PlannedGather

    rng = np.random.RandomState(1)
    n, W = 3000, 37
    cols = (np.arange(n)[:, None] * 7 + rng.randint(0, 64, (n, W))) % (7 * n)
    deg = rng.randint(1, W + 1, n)
    w = rng.rand(n, W).astype(np.float32)
    w[np.arange(W)[None, :] >= deg[:, None]] = 0.0
    g = PlannedGather.build(cols, w)
    assert isinstance(g, ChainedGather)
    # both stages stay in the measured-safe kernel envelope
    for st in (g.stage1, g.stage2):
        assert st.key[0] <= 160, st.key
    table = rng.rand(7 * n).astype(np.float32)
    np.testing.assert_allclose(
        _emulate(g, table), (w * table[cols]).sum(axis=1),
        rtol=2e-5, atol=1e-5,
    )


def test_planned_gather_empty_rows():
    from arcanefem_tpu.sparse.pallas_spmv import PlannedGather

    rng = np.random.RandomState(2)
    n, W = 1500, 4
    cols = (np.arange(n)[:, None] + rng.randint(0, 16, (n, W))) % n
    w = rng.rand(n, W).astype(np.float32)
    w[::7] = 0.0  # every 7th row entirely empty
    g = PlannedGather.build(cols, w)
    assert g is not None
    table = rng.rand(n).astype(np.float32)
    got = _emulate(g, table)
    ref = (w * table[cols]).sum(axis=1)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
    assert np.all(got[::7] == 0.0)


def test_build_csr_matches_dense_split():
    """PlannedGather.build_csr (CSR input, no dense (n,K) intermediate)
    encodes the same linear map as the dense wide-row build."""
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather, PlannedGather

    rng = np.random.RandomState(3)
    n, W = 2500, 21
    cols = (np.arange(n)[:, None] * 5 + rng.randint(0, 48, (n, W))) % (5 * n)
    deg = rng.randint(0, W + 1, n)  # includes empty rows
    w = np.ones((n, W), np.float32)
    w[np.arange(W)[None, :] >= deg[:, None]] = 0.0
    dense = PlannedGather.build(cols, w, wcap=8)
    # CSR form of the same map (weights all-ones)
    real = w != 0.0
    indices = cols[real]
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(real.sum(axis=1), out=indptr[1:])
    csr = PlannedGather.build_csr(indices, indptr, wcap=8)
    assert isinstance(csr, ChainedGather)
    table = rng.rand(5 * n).astype(np.float32)
    np.testing.assert_allclose(
        _emulate(csr, table), _emulate(dense, table), rtol=2e-5, atol=1e-5
    )


def test_sorted_entry_assembler_matches_segment_sum():
    """SortedEntryAssembler's plan (emulated) == segment_sum assembly."""
    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.sparse.pallas_assembly import SortedEntryAssembler

    mesh = box_tetra_mesh(7, 6, 5)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(
        mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols)
    )
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    sea = SortedEntryAssembler(topo)
    assert sea.available
    rng = np.random.RandomState(4)
    E = sum(m.size for m in topo.slot_maps.values())
    ke = rng.rand(E).astype(np.float32)
    slots = np.concatenate(
        [topo.slot_maps[k].reshape(-1) for k in topo.slot_maps]
    )
    want = np.zeros(topo.n_slots, np.float64)
    np.add.at(want, slots, ke)
    got = _emulate(sea.plan, ke)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-5)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_lane_assembler_window_matches_segsum_on_tpu():
    import jax.numpy as jnp

    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler

    mesh = box_tetra_mesh(12, 11, 10)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(
        mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols)
    )
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    conn = mesh.cells["tetra4"]
    coords = jnp.asarray(mesh.coords.astype(np.float32))
    a_seg = TetraLaneAssembler(topo, conn, reduce="segsum")
    a_win = TetraLaneAssembler(topo, conn, reduce="window")
    assert a_win.reducer is not None
    v1 = np.asarray(a_seg(coords))
    v2 = np.asarray(a_win(coords))
    np.testing.assert_allclose(v2, v1, rtol=3e-5, atol=1e-6)


def test_sorted_entry_assembler_symmetric_packing():
    """entry_map redirecting lower-triangle ke entries at their upper
    twins (the lane assembler's 10-entry table) reproduces the full
    16-entry segment_sum assembly for symmetric element matrices."""
    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.sparse.pallas_assembly import SortedEntryAssembler

    mesh = box_tetra_mesh(6, 5, 4)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(
        mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols)
    )
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    nc = mesh.cells["tetra4"].shape[0]
    tri10 = {}
    for k, (i, j) in enumerate(
        (i, j) for i in range(4) for j in range(i, 4)
    ):
        tri10[(i, j)] = k
    q2p = np.array(
        [tri10[(min(i, j), max(i, j))]
         for i in range(4) for j in range(4)], np.int64
    )
    e = np.arange(16 * nc, dtype=np.int64)
    entry_map = (e // 16) * 10 + q2p[e % 16]
    sea = SortedEntryAssembler(topo, entry_map=entry_map)
    assert sea.available

    rng = np.random.RandomState(5)
    sym = rng.rand(nc, 4, 4).astype(np.float32)
    sym = sym + sym.transpose(0, 2, 1)  # symmetric element matrices
    iu = [(i, j) for i in range(4) for j in range(i, 4)]
    ke10 = np.stack([sym[:, i, j] for (i, j) in iu], axis=1)  # (nc, 10)
    want = np.zeros(topo.n_slots, np.float64)
    np.add.at(want, topo.slot_maps["tetra4"].reshape(-1), sym.reshape(-1))
    got = _emulate(sea.plan, ke10.reshape(-1))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-5)


def test_reordered_assembler_matches_segment_sum():
    """ReorderedAssembler (16 per-pair streams + multi-window reduce),
    emulated stage by stage, == full 16-entry segment_sum assembly."""
    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.sparse.pallas_assembly import ReorderedAssembler

    mesh = box_tetra_mesh(7, 6, 5)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(
        mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols)
    )
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    conn = mesh.cells["tetra4"]
    nc = conn.shape[0]
    ra = ReorderedAssembler(topo, conn)
    assert ra.available

    rng = np.random.RandomState(7)
    sym = rng.rand(nc, 4, 4).astype(np.float32)
    sym = sym + sym.transpose(0, 2, 1)
    iu = [(i, j) for i in range(4) for j in range(i, 4)]
    ke10 = np.stack([sym[:, i, j] for (i, j) in iu])  # (10, nc)

    segs = [
        _emulate(p, ke10[r]) for p, r in zip(ra.plans, ra.rows10)
    ]
    got = _emulate(ra.reduce, np.concatenate(segs))
    want = np.zeros(topo.n_slots, np.float64)
    np.add.at(want, topo.slot_maps["tetra4"].reshape(-1), sym.reshape(-1))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-5)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_lane_assembler_reorder_matches_segsum_on_tpu():
    import jax.numpy as jnp

    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler

    mesh = box_tetra_mesh(12, 11, 10)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(
        mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols)
    )
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    conn = mesh.cells["tetra4"]
    coords = jnp.asarray(mesh.coords.astype(np.float32))
    a_seg = TetraLaneAssembler(topo, conn, reduce="segsum")
    a_re = TetraLaneAssembler(topo, conn, reduce="reorder")
    assert a_re.reducer is not None
    v1 = np.asarray(a_seg(coords))
    v2 = np.asarray(a_re(coords))
    np.testing.assert_allclose(v2, v1, rtol=3e-5, atol=1e-6)


def test_planned_gather_bf16_weights():
    """with_weights_dtype(bf16): same plan, half-width weight stream; the
    emulated product (f32 accumulate, like the kernel) stays within bf16
    relative error of the f32 reference."""
    import jax.numpy as jnp

    from arcanefem_tpu.sparse.pallas_spmv import PlannedGather

    rng = np.random.RandomState(1)
    n, W = 1500, 8
    cols = (np.arange(n)[:, None] * 3 + rng.randint(0, 40, (n, W))) % (3 * n)
    w = rng.rand(n, W).astype(np.float32)
    g = PlannedGather.build(cols, w)
    assert g is not None
    gb = g.with_weights_dtype(jnp.bfloat16)
    assert gb.vals_tiled.dtype == jnp.bfloat16
    assert gb.key == g.key and gb.n_rows == g.n_rows

    table = rng.rand(3 * n).astype(np.float32)
    ref = (w * table[cols]).sum(axis=1)

    # emulate with the quantized weights (the kernel upcasts to f32)
    gq = g.with_weights_dtype(jnp.bfloat16).with_weights_dtype(jnp.float32)
    got = _emulate(gq, table)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=1e-2)
    # and it is genuinely quantized, not a pass-through
    assert np.abs(np.asarray(gq.vals_tiled) -
                  np.asarray(g.vals_tiled)).max() > 0

def test_build_compact_wide_rows_linear_map():
    """PlannedGather.build(compact=True) on AMG-level-like wide rows
    (W=60, banded) emulates to exactly y = sum_j w[r,j] x[cols[r,j]] —
    the path build_amg's level operators take under AFEM_SPMV=compact."""
    from arcanefem_tpu.sparse.pallas_spmv import PlannedGather

    rng = np.random.RandomState(11)
    n, W, bw = 3000, 60, 180
    base = np.clip(np.arange(n)[:, None] - bw // 2, 0, n - 1)
    cols = np.clip(base + rng.randint(0, bw, (n, W)), 0, n - 1)
    w = rng.randn(n, W).astype(np.float32)
    w[rng.rand(n, W) < 0.3] = 0.0  # padding entries
    g = PlannedGather.build(cols, w, compact=True)
    assert g is not None
    x = rng.rand(n).astype(np.float32)
    y = _emulate(g, x)
    ref = (w * x[cols]).sum(axis=1)
    np.testing.assert_allclose(y, ref, rtol=3e-5, atol=3e-5)


def test_unit_plan_auto_detection():
    """All-ones real weights -> unit plan (vals_tiled None, sentinel pads);
    any non-1.0 weight keeps the weighted form.  Both emulate to the same
    linear map as the dense reference."""
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather, PlannedGather

    rng = np.random.RandomState(7)
    n, W = 2000, 8
    cols = (np.arange(n)[:, None] * 3 + rng.randint(0, 40, (n, W))) % (3 * n)
    w = np.ones((n, W), np.float32)
    w[rng.rand(n, W) < 0.3] = 0.0  # padding entries
    g = PlannedGather.build(cols, w)
    assert g is not None and not isinstance(g, ChainedGather)
    assert g.vals_tiled is None, "all-ones weights should build a unit plan"
    # padding entries carry the sentinel (never matched by the sweep)
    from arcanefem_tpu.sparse.pallas_spmv import _UNIT_PAD

    n_pad_entries = int((np.asarray(g.lcols) >= int(_UNIT_PAD)).sum())
    assert n_pad_entries >= int((w == 0).sum())
    table = rng.rand(3 * n).astype(np.float32)
    np.testing.assert_allclose(
        _emulate(g, table), (w * table[cols]).sum(axis=1),
        rtol=2e-5, atol=1e-5,
    )
    # with_weights_dtype is a no-op on unit plans
    assert g.with_weights_dtype(np.float16) is g

    w2 = w.copy()
    w2[0, 0] = 2.0
    g2 = PlannedGather.build(cols, w2)
    assert g2.vals_tiled is not None
    np.testing.assert_allclose(
        _emulate(g2, table), (w2 * table[cols]).sum(axis=1),
        rtol=2e-5, atol=1e-5,
    )


def test_sorted_entry_assembler_compact_matches_segment_sum():
    """compact=True (per-block distinct-source pre-gather, the SpMV
    compaction applied to assembly) emulates to the same reduction as
    segment_sum, and actually engages (stage1 is itself a ChainedGather)."""
    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.sparse.pallas_assembly import SortedEntryAssembler
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather

    mesh = box_tetra_mesh(7, 6, 5)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(
        mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols)
    )
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    sea = SortedEntryAssembler(topo, compact=True)
    assert sea.available
    assert isinstance(sea.plan, ChainedGather)
    assert isinstance(sea.plan.stage1, ChainedGather), (
        "compaction should engage: stage1 = pre-gather + uniq-window sweep"
    )
    rng = np.random.RandomState(4)
    E = sum(m.size for m in topo.slot_maps.values())
    ke = rng.rand(E).astype(np.float32)
    slots = np.concatenate(
        [topo.slot_maps[k].reshape(-1) for k in topo.slot_maps]
    )
    want = np.zeros(topo.n_slots, np.float64)
    np.add.at(want, slots, ke)
    got = _emulate(sea.plan, ke)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-5)


def test_planned_gather_compact_w1_unit():
    """W=1 unit-weight compact plan (the assembly coords gather shape):
    pre-gather + uniq-window main sweep == plain table[cols]."""
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather, PlannedGather

    rng = np.random.RandomState(3)
    n_nodes, m = 5000, 40000
    # connectivity-like pattern: slowly advancing band + jitter
    cols = (np.linspace(0, n_nodes - 50, m).astype(np.int64)
            + rng.randint(0, 50, m))[:, None]
    g = PlannedGather.build(
        cols, np.ones((m, 1), np.float32), wcap=0, compact=True
    )
    assert isinstance(g, ChainedGather), "compaction should engage"
    table = rng.rand(n_nodes).astype(np.float32)
    np.testing.assert_allclose(
        _emulate(g, table), table[cols[:, 0]], rtol=2e-5, atol=1e-5
    )


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_lane_assembler_compact_batched_matches_segsum_on_tpu(monkeypatch):
    """Compact assembly plans + batched coords gather on hardware ==
    segment_sum (the AFEM_ASM_COMPACT / AFEM_ASM_COORDS A/B surface)."""
    import jax.numpy as jnp

    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather

    mesh = box_tetra_mesh(12, 11, 10)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(
        mesh, rcm_order(mesh.n_nodes, t0.row_ptr, t0.csr_cols)
    )
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    conn = mesh.cells["tetra4"]
    coords = jnp.asarray(mesh.coords.astype(np.float32))
    v1 = np.asarray(TetraLaneAssembler(topo, conn, reduce="segsum")(coords))

    monkeypatch.setenv("AFEM_ASM_COMPACT", "1")
    a_c = TetraLaneAssembler(topo, conn, reduce="window")
    assert a_c.reducer is not None and a_c.compact
    assert isinstance(a_c.reducer, ChainedGather)
    assert isinstance(a_c.reducer.stage1, ChainedGather), (
        "compaction should engage on this mesh"
    )
    v2 = np.asarray(a_c(coords))
    np.testing.assert_allclose(v2, v1, rtol=3e-5, atol=1e-6)

    monkeypatch.setenv("AFEM_ASM_COORDS", "batched")
    v3 = np.asarray(a_c(coords))
    np.testing.assert_allclose(v3, v1, rtol=3e-5, atol=1e-6)


def test_banded_gather_stream_parity():
    """BandedGather (band_gather.py) emulation: out[tile_perm-mapped
    position] == table[request] for every real request, mixed
    narrow/wide streams."""
    from arcanefem_tpu.sparse.band_gather import BandedGather

    rng = np.random.RandomState(5)
    # sorted runs with mixed strides: dense (stride ~3), sparse
    # (stride ~200 -> wide tiles), and a run-boundary jump down
    runs = []
    base = 0
    for stride, ln in ((3, 2000), (200, 400), (5, 1500), (90, 500)):
        r = base + np.cumsum(rng.randint(1, stride + 1, ln))
        runs.append(r)
        base = int(r[-1] // 3)  # next run jumps back (run boundary)
    req = np.concatenate(runs).astype(np.int64)
    g, perm = BandedGather.build(req, K=16)
    assert g is not None
    assert 0 < g.n_narrow < g.n_tiles  # genuinely mixed
    table = rng.rand(int(req.max()) + 7).astype(np.float32)
    out = g.emulate(table)
    m = len(req)
    pos = perm[np.arange(m) // 128] * 128 + np.arange(m) % 128
    np.testing.assert_allclose(out[pos], table[req], rtol=0, atol=0)


def test_compact_chain_with_band_pre(monkeypatch):
    """The full compact plan under AFEM_BAND_PRE=1: remap permutation +
    banded stage-1 reproduce exactly the same linear map."""
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather, PlannedGather

    monkeypatch.setenv("AFEM_BAND_PRE", "1")
    rng = np.random.RandomState(7)
    n, W = 4000, 8
    cols = (np.arange(n)[:, None] * 3 + rng.randint(0, 40, (n, W))) % (3 * n)
    w = rng.rand(n, W).astype(np.float32)
    w[rng.rand(n, W) < 0.3] = 0.0
    g = PlannedGather.build(cols, w, compact=True)
    assert isinstance(g, ChainedGather)
    from arcanefem_tpu.sparse.band_gather import BandedGather

    assert isinstance(g.stage1, BandedGather), type(g.stage1)
    table = rng.rand(3 * n).astype(np.float32)
    np.testing.assert_allclose(
        _emulate(g, table), (w * table[cols]).sum(axis=1),
        rtol=2e-5, atol=1e-5,
    )


def test_split_compact_chain_with_band_pre(monkeypatch):
    """Wide rows (subrow split) + compact + banded pre — the production
    fine-operator shape (W=25 > wcap) under AFEM_BAND_PRE=1."""
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather, PlannedGather

    monkeypatch.setenv("AFEM_BAND_PRE", "1")
    rng = np.random.RandomState(8)
    n, W = 3000, 25
    cols = (np.arange(n)[:, None] * 5 + rng.randint(0, 60, (n, W))) % (5 * n)
    deg = rng.randint(5, W + 1, n)
    w = rng.rand(n, W).astype(np.float32)
    w[np.arange(W)[None, :] >= deg[:, None]] = 0.0
    g = PlannedGather.build(cols, w, compact=True)
    assert isinstance(g, ChainedGather)
    table = rng.rand(5 * n).astype(np.float32)
    np.testing.assert_allclose(
        _emulate(g, table), (w * table[cols]).sum(axis=1),
        rtol=2e-5, atol=1e-5,
    )


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_banded_gather_kernel_on_tpu():
    """Band kernel == its numpy emulation on hardware (mixed streams)."""
    import jax.numpy as jnp

    from arcanefem_tpu.sparse.band_gather import BandedGather

    rng = np.random.RandomState(11)
    runs = []
    base = 0
    for stride, ln in ((3, 3000), (150, 600), (6, 2500)):
        r = base + np.cumsum(rng.randint(1, stride + 1, ln))
        runs.append(r)
        base = int(r[-1] // 2)
    req = np.concatenate(runs).astype(np.int64)
    g, perm = BandedGather.build(req, K=16)
    assert g is not None and 0 < g.n_narrow < g.n_tiles
    table = rng.rand(int(req.max()) + 9).astype(np.float32)
    got = np.asarray(jax.jit(lambda gg, t: gg(t))(g, jnp.asarray(table)))
    want = g.emulate(table)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # batched form too
    tb = np.stack([table, table * 2.0 + 1.0])
    gotb = np.asarray(
        jax.jit(lambda gg, t: gg.call_batched(t))(g, jnp.asarray(tb)))
    np.testing.assert_allclose(gotb[0], want, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        gotb[1], g.emulate(tb[1]), rtol=1e-6, atol=1e-6)
