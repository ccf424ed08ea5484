from .core import CELL_NNODES, Mesh, read_msh
from .generate import box_tetra_mesh, rect_tria_mesh

__all__ = ["Mesh", "read_msh", "CELL_NNODES", "box_tetra_mesh", "rect_tria_mesh"]
