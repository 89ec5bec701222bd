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
    """U [K, N] nodal DG coefficients -> filename.vtu.

    Order 1 writes one linear cell per element; order 2 subdivides each
    element at its midpoint nodes (4 linear sub-cells per P2 triangle /
    Q2 quad — exact at every nodal point)."""
    if not filename.endswith(".vtu"):
        filename += ".vtu"
    assert space.order in (1, 2), "vtu writer supports P1/P2/Q1/Q2 output"
    xn = space.node_coords_phys().reshape(-1, 2)        # [K*s*s*T*nb, 2]
    vals = np.asarray(U).reshape(-1)
    nb = space.nb
    n_elems = xn.shape[0] // nb
    if nb == 3:
        vtk_type, subcells = 5, ((0, 1, 2),)            # VTK_TRIANGLE
    elif nb == 4:
        vtk_type, subcells = 9, ((0, 1, 3, 2),)         # VTK_QUAD (ccw)
    elif nb == 6:                                       # P2 tri: v0 v1 v2 +
        vtk_type, subcells = 5, ((0, 3, 5), (3, 1, 4),  # midpoints m01 m12 m20
                                 (5, 4, 2), (3, 4, 5))
    else:                                               # Q2: 3x3, x fastest
        vtk_type, subcells = 9, ((0, 1, 4, 3), (1, 2, 5, 4),
                                 (3, 4, 7, 6), (4, 5, 8, 7))
    sub = np.asarray(subcells)                          # [nsub, nv]
    n_cells = n_elems * sub.shape[0]
    nb_out = sub.shape[1]
    conn = (np.arange(n_elems)[:, None, None] * nb
            + sub[None, :, :]).reshape(-1)
    nb = nb_out                                         # offsets stride below
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


def write_hex_vtu(space, U, filename: str, name: str = "u"):
    """3D hex-family writer: U [K, N] Q1/Q2 nodal coefficients ->
    filename.vtu (duplicated points preserve the DG jumps).

    Q1 writes one VTK_HEXAHEDRON per cell; Q2 subdivides each hex into
    8 sub-hexes whose corners are the half-lattice Q2 nodes (exact: the
    output samples the nodal values, no re-interpolation).

    VTK hex node order: bottom quad ccw (z=0), then top quad ccw (z=1);
    ours is j = (iz*n1 + iy)*n1 + ix with n1 = order + 1."""
    if not filename.endswith(".vtu"):
        filename += ".vtu"
    assert getattr(space, "dim", 2) == 3 and space.order in (1, 2)
    xn = space.node_coords_phys().reshape(-1, 3)
    vals = np.asarray(U).reshape(-1)
    nb = space.nb
    p = space.order
    n1 = p + 1
    # VTK corner order as (dx, dy, dz)
    corn = ((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
            (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))
    sub = np.array([[((oz + dz) * n1 + (oy + dy)) * n1 + (ox + dx)
                     for dx, dy, dz in corn]
                    for oz in range(p) for oy in range(p) for ox in range(p)])
    n_elems = xn.shape[0] // nb
    n_cells = n_elems * p ** 3
    conn = (np.arange(n_elems)[:, None, None] * nb + sub[None]).reshape(-1)
    with open(filename, "w") as f:
        f.write(_vtu_header(xn.shape[0], n_cells))
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">\n')
        for x, y, z in xn:
            f.write(f"{x} {y} {z}\n")
        f.write('</DataArray></Points>\n<Cells>\n')
        f.write('<DataArray type="Int32" Name="connectivity" format="ascii">\n')
        f.write(" ".join(str(i) for i in conn))
        f.write('\n</DataArray>\n<DataArray type="Int32" Name="offsets" format="ascii">\n')
        f.write(" ".join(str(8 * (i + 1)) for i in range(n_cells)))
        f.write('\n</DataArray>\n<DataArray type="UInt8" Name="types" format="ascii">\n')
        f.write(" ".join("12" for _ in range(n_cells)))
        f.write('\n</DataArray>\n</Cells>\n')
        f.write(f'<PointData Scalars="{name}">'
                f'<DataArray type="Float64" Name="{name}" format="ascii">\n')
        f.write(" ".join(f"{v}" for v in vals))
        f.write('\n</DataArray></PointData>\n')
        f.write('</Piece>\n</UnstructuredGrid>\n</VTKFile>\n')
    return filename
