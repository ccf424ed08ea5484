"""Numpy emulation of the Pallas window-gather plans.

Executes a PlannedGather/ChainedGather's plan arrays with numpy exactly
as the Mosaic kernel would (window DMA → virtual-index resolve → masked
accumulate), so plan CORRECTNESS is testable on CPU CI where no TPU is
available.  The on-TPU parity tests (tests/test_pallas_spmv.py -k
on_tpu) then check the kernel against these same semantics on hardware.
"""

from __future__ import annotations

import numpy as np

from ..sparse.pallas_spmv import _UNIT_PAD, LANE, PlannedGather


def emulate_planned(g, table):
    """Numpy emulation of the window kernel from a PlannedGather's plan."""
    assert isinstance(g, PlannedGather)
    G, slot_rows, nb = g.key
    R = G * LANE // g.width
    offs = np.concatenate([[0], np.cumsum(slot_rows)])
    need = g.need_rows * LANE
    n_t = -(-max(len(table), need) // LANE) * LANE
    tp = np.zeros(n_t, np.float32)
    tp[: len(table)] = table
    tp = tp.reshape(-1, LANE)
    lcols = np.asarray(g.lcols)
    lo = np.asarray(g.lo)
    # unit plans: no weights array; padding rides the _UNIT_PAD sentinel
    # (its window row never matches a sweep row -> exact 0 contribution)
    pad = lcols >= int(_UNIT_PAD)
    lcols = np.where(pad, 0, lcols)
    if g.vals_tiled is None:
        vals = np.where(pad, 0.0, 1.0).astype(np.float32)
    else:
        # native-planner weighted plans carry the sentinel at zero-weight
        # pads (numpy plans point pads at a nearby real column instead);
        # either way the pad weight is 0, so the product is exact 0
        vals = np.asarray(g.vals_tiled, np.float32)
        assert not (pad & (vals != 0.0)).any(), \
            "sentinel under a NON-zero weight"
        vals = np.where(pad, 0.0, vals)
    vrow, lane = lcols >> 7, lcols & (LANE - 1)
    s = np.searchsorted(offs, vrow, side="right") - 1
    src = lo[np.arange(nb)[:, None, None], s] + vrow - offs[s]
    prods = vals * tp[src, lane]
    return prods.reshape(nb * R, g.width).sum(axis=1)[: g.n_rows]


def emulate_gather(g, table):
    """Emulate a PlannedGather, (nested) ChainedGather, or BandedGather."""
    from ..sparse.pallas_spmv import ChainedGather

    if isinstance(g, ChainedGather):
        # compact plans nest: stage1 may itself be a ChainedGather
        # (column pre-gather -> remapped main sweep)
        return emulate_gather(g.stage2, emulate_gather(g.stage1, table))
    if not isinstance(g, PlannedGather) and hasattr(g, "emulate"):
        # BandedGather (sparse/band_gather.py) carries its own emulation
        return g.emulate(np.asarray(table, np.float32))
    return emulate_planned(g, table)
