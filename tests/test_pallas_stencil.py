"""Pallas plane-streaming stencil assembly (TPU-only kernel).

On CPU we verify the auto-dispatch falls back to the XLA path; the kernel
itself is validated on TPU (small-size exact-ish match + bench usage).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arcanefem_tpu.mesh.structured import StructuredBox


def test_auto_dispatch_cpu_falls_back():
    box = StructuredBox(4, 3, 5)
    c = jnp.asarray(box.grid_coords(np.float64, jitter=0.1))
    A = box.assemble_stiffness(c, backend="auto")
    B = box.assemble_stiffness(c, backend="xla")
    np.testing.assert_array_equal(np.asarray(A.bands), np.asarray(B.bands))


@pytest.mark.skipif(jax.devices()[0].platform != "tpu", reason="needs TPU")
def test_pallas_stencil_matches_xla_on_tpu():
    from arcanefem_tpu.mesh.pallas_stencil import assemble_stiffness_pallas

    box = StructuredBox(12, 10, 8)
    c = jnp.asarray(box.grid_coords(np.float32, jitter=0.1))
    ref = box.assemble_stiffness(c, backend="xla")
    got = assemble_stiffness_pallas(box, c)
    scale = float(jnp.abs(ref.bands).max())
    err = float(jnp.abs(got.bands - ref.bands).max())
    assert err / scale < 1e-5
