"""VTU output for DG functions on the structured grids (tri and quad).

Replaces dune-gdt's ``.visualize`` / ``DuneGDTVisualizer`` surface
(SURVEY.md §2.3 "Discrete functions & visualization";
``discretize_elliptic_block_swipdg.py:802``, ``mpi_elliptic.py:58``).
DG functions are written with duplicated points (one point per element
corner) so discontinuities are preserved.
"""
from __future__ import annotations

import numpy as np


def _vtu_header(n_points, n_cells):
    return (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">\n'
        '<UnstructuredGrid>\n'
        f'<Piece NumberOfPoints="{n_points}" NumberOfCells="{n_cells}">\n'
    )


def write_dg_vtu(space, U, filename: str, name: str = "u"):
    """U [K, N] nodal P1/Q1 DG coefficients -> filename.vtu"""
    if not filename.endswith(".vtu"):
        filename += ".vtu"
    assert space.order == 1, "vtu writer supports P1/Q1 output (project first)"
    xn = space.node_coords_phys().reshape(-1, 2)        # [K*s*s*T*nb, 2]
    vals = np.asarray(U).reshape(-1)
    nb = space.nb
    n_cells = xn.shape[0] // nb
    if nb == 3:
        vtk_type, perm = 5, (0, 1, 2)                   # VTK_TRIANGLE
    else:
        vtk_type, perm = 9, (0, 1, 3, 2)                # VTK_QUAD (ccw order)
    conn = (np.arange(n_cells)[:, None] * nb
            + np.asarray(perm)[None, :]).reshape(-1)
    with open(filename, "w") as f:
        f.write(_vtu_header(xn.shape[0], n_cells))
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">\n')
        for x, y in xn:
            f.write(f"{x} {y} 0\n")
        f.write('</DataArray></Points>\n<Cells>\n')
        f.write('<DataArray type="Int32" Name="connectivity" format="ascii">\n')
        f.write(" ".join(str(i) for i in conn))
        f.write('\n</DataArray>\n<DataArray type="Int32" Name="offsets" format="ascii">\n')
        f.write(" ".join(str(nb * (i + 1)) for i in range(n_cells)))
        f.write('\n</DataArray>\n<DataArray type="UInt8" Name="types" format="ascii">\n')
        f.write(" ".join(str(vtk_type) for _ in range(n_cells)))
        f.write('\n</DataArray>\n</Cells>\n')
        f.write(f'<PointData Scalars="{name}">'
                f'<DataArray type="Float64" Name="{name}" format="ascii">\n')
        f.write(" ".join(f"{v}" for v in vals))
        f.write('\n</DataArray></PointData>\n')
        f.write('</Piece>\n</UnstructuredGrid>\n</VTKFile>\n')
    return filename


def write_grid_vtu(grid, filename: str):
    """Subdomain-id field on the grid (<-> ``grid.visualize``)."""
    from ..ops.spaces import BlockDGSpace
    space = BlockDGSpace(grid, order=1)
    K = grid.num_subdomains
    ids = np.repeat(np.arange(K, dtype=float)[:, None], space.N, axis=1)
    return write_dg_vtu(space, ids, filename, name="subdomain")
