"""Nodal DG bases on the structured triangulation (P1 / P2).

Replaces dune-gdt's DG space shape-function machinery
(``make_block_dg_space`` / ``make_dg_space``, SURVEY.md §2.3 "DG spaces").
We use *nodal* Lagrange bases (values at element nodes) — basis choice is an
internal detail; all model outputs (solutions as functions, estimator values,
reduced quantities) are basis-independent.  Nodal bases make Oswald
interpolation (vertex averaging), prolongation (point evaluation) and
visualization trivial array programs.

Unit-cell triangle vertices (see grid.py):
  A: a0=(0,0), a1=(1,0), a2=(1,1)      (below the (0,0)-(1,1) diagonal)
  B: b0=(0,0), b1=(0,1), b2=(1,1)      (above)

Barycentric coordinates (unit-cell coords xi, eta):
  A: l0 = 1-xi, l1 = xi-eta, l2 = eta
  B: l0 = 1-eta, l1 = eta-xi, l2 = xi

Local edges (edge k connects vertex k and k+1 mod 3):
  A: e0 = bottom (a0,a1), e1 = right (a1,a2), e2 = diagonal (a2,a0)
  B: e0 = left (b0,b1), e1 = top (b1,b2), e2 = diagonal (b2,b0)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

TRI_VERTS_UNIT = {
    "A": np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]),
    "B": np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0]]),
}

# unit-cell gradients of the barycentric coordinates: [3, 2]
TRI_BARY_GRAD_UNIT = {
    "A": np.array([[-1.0, 0.0], [1.0, -1.0], [0.0, 1.0]]),
    "B": np.array([[0.0, -1.0], [-1.0, 1.0], [1.0, 0.0]]),
}


def barycentric(tri: str, pts: np.ndarray) -> np.ndarray:
    """pts [..., 2] unit-cell coords -> [..., 3] barycentric coords."""
    xi, eta = pts[..., 0], pts[..., 1]
    if tri == "A":
        return np.stack([1 - xi, xi - eta, eta], axis=-1)
    if tri == "B":
        return np.stack([1 - eta, eta - xi, xi], axis=-1)
    raise ValueError(tri)


def num_basis(order: int) -> int:
    return {1: 3, 2: 6}[order]


def node_coords_unit(tri: str, order: int) -> np.ndarray:
    """Nodal points in unit-cell coords: [nb, 2].

    P1: the 3 vertices.  P2: vertices + edge midpoints (node 3+k on edge k).
    """
    v = TRI_VERTS_UNIT[tri]
    if order == 1:
        return v.copy()
    if order == 2:
        mids = np.array([(v[0] + v[1]) / 2, (v[1] + v[2]) / 2, (v[2] + v[0]) / 2])
        return np.concatenate([v, mids], axis=0)
    raise ValueError(order)


def eval_basis(tri: str, order: int, pts: np.ndarray) -> np.ndarray:
    """Nodal basis values at unit-cell points: [..., nb]."""
    lam = barycentric(tri, pts)
    if order == 1:
        return lam
    if order == 2:
        l0, l1, l2 = lam[..., 0], lam[..., 1], lam[..., 2]
        return np.stack([
            l0 * (2 * l0 - 1), l1 * (2 * l1 - 1), l2 * (2 * l2 - 1),
            4 * l0 * l1, 4 * l1 * l2, 4 * l2 * l0,
        ], axis=-1)
    raise ValueError(order)


def eval_basis_grad_unit(tri: str, order: int, pts: np.ndarray) -> np.ndarray:
    """Unit-cell gradients of the nodal basis at points: [..., nb, 2].

    Physical gradients are obtained by dividing component-wise by (hx, hy).
    """
    g = TRI_BARY_GRAD_UNIT[tri]          # [3, 2]
    lam = barycentric(tri, pts)          # [..., 3]
    if order == 1:
        return np.broadcast_to(g, pts.shape[:-1] + (3, 2)).copy()
    if order == 2:
        l = lam[..., :, None]            # [..., 3, 1]
        dvert = (4 * l - 1) * g          # [..., 3, 2]
        d01 = 4 * (lam[..., 0, None] * g[1] + lam[..., 1, None] * g[0])
        d12 = 4 * (lam[..., 1, None] * g[2] + lam[..., 2, None] * g[1])
        d20 = 4 * (lam[..., 2, None] * g[0] + lam[..., 0, None] * g[2])
        dmid = np.stack([d01, d12, d20], axis=-2)   # [..., 3, 2]
        return np.concatenate([dvert, dmid], axis=-2)
    raise ValueError(order)


@dataclass(frozen=True)
class EdgeGeom:
    """Unit-cell parametrization of a face family edge: x(t) = start + t*dir."""
    start: Tuple[float, float]
    direction: Tuple[float, float]

    def points(self, t: np.ndarray) -> np.ndarray:
        s = np.asarray(self.start)
        d = np.asarray(self.direction)
        return s[None, :] + t[:, None] * d[None, :]


# unit-cell edge parametrizations used by the face families (grid.py docstring)
EDGES_UNIT = {
    # face family: (minus-side (tri, edge geom), plus-side (tri, edge geom))
    # D: the in-cell diagonal, minus = A, plus = B, both parametrized (t, t)
    "D": (("A", EdgeGeom((0.0, 0.0), (1.0, 1.0))),
          ("B", EdgeGeom((0.0, 0.0), (1.0, 1.0)))),
    # V: between cell (cx,.) right edge (A) and cell (cx+1,.) left edge (B)
    "V": (("A", EdgeGeom((1.0, 0.0), (0.0, 1.0))),
          ("B", EdgeGeom((0.0, 0.0), (0.0, 1.0)))),
    # H: between cell (.,cy) top edge (B) and cell (.,cy+1) bottom edge (A)
    "H": (("B", EdgeGeom((0.0, 1.0), (1.0, 0.0))),
          ("A", EdgeGeom((0.0, 0.0), (1.0, 0.0)))),
}

# boundary edges: (tri, edge geom, outward normal sign convention handled in assembly)
BOUNDARY_EDGES_UNIT = {
    "left":   ("B", EdgeGeom((0.0, 0.0), (0.0, 1.0))),
    "right":  ("A", EdgeGeom((1.0, 0.0), (0.0, 1.0))),
    "bottom": ("A", EdgeGeom((0.0, 0.0), (1.0, 0.0))),
    "top":    ("B", EdgeGeom((0.0, 1.0), (1.0, 0.0))),
}

# local edge index (0,1,2) of each face family side within its triangle,
# needed for RT0 dof bookkeeping (edge k connects vertex k, k+1 mod 3)
FACE_LOCAL_EDGE = {
    "D": (2, 2),       # diagonal is edge 2 for both A and B
    "V": (1, 0),       # minus: A right = e1; plus: B left = e0
    "H": (1, 0),       # minus: B top = e1; plus: A bottom = e0
}
BOUNDARY_LOCAL_EDGE = {"left": 0, "right": 1, "bottom": 0, "top": 1}
