"""Per-quadrature-point stress recovery vs an independent analytic oracle.

The reference's `calculate_stresses_simp` returns sigma at EVERY quadrature
point per cell (FiniteElementAnalysis.jl:537-597, Dict{cell -> [sigma_qp]});
StressField reproduces that API shape.  These tests pin the VALUES with an
oracle that never touches the library's B-matrix helpers: displacement
fields inside the trilinear hex8 span (so FE interpolation is exact) whose
strains are written down analytically at each Gauss point's physical
location.
"""

import numpy as np
import pytest

import easysimp_tpu as et
from easysimp_tpu.stress import voxel_stresses, unstructured_stresses

# 2x2x2 Gauss abscissa on [-1, 1]
_G = 1.0 / np.sqrt(3.0)


def _node_coord_field(grid):
    """Node coordinates in the node-field layout (nx+1, ny+1, nz+1, 3)."""
    nnx, nny, nnz = grid.nnodes_per_axis
    ax = [np.arange(n) * h + o for n, h, o in
          zip((nnx, nny, nnz), grid.spacing, grid.origin)]
    return np.stack(np.meshgrid(*ax, indexing="ij"), axis=-1)


def _gauss_physical_points(lo, spacing):
    """Physical coordinates of the 8 Gauss points of one hex, in the
    library's qp order (x fastest, matching ops/elements
    _gauss_points_2x2x2)."""
    pts = []
    for c in (-_G, _G):
        for b in (-_G, _G):
            for a in (-_G, _G):
                pts.append(lo + (np.array([a, b, c]) + 1.0) * spacing / 2.0)
    return np.array(pts)  # (8, 3)




def test_voxel_qp_stresses_match_analytic_field():
    """u_x = x*y, u_y = 0, u_z = z  ->  eps_xx = y, eps_zz = 1,
    gamma_xy = x (engineering), everything else 0; sigma per qp from the
    Lame relation with the SIMP-scaled modulus.  x*y and z are inside the
    trilinear span, so the FE strains are EXACT at every Gauss point."""
    E0, Emin, nu, p = 200.0, 1e-6, 0.3, 3.0
    grid = et.generate_grid((3, 2, 2), (0.0, 0.0, 0.0), (3.0, 2.0, 2.0))
    X = _node_coord_field(grid)              # (nx+1, ny+1, nz+1, 3)
    u = np.zeros_like(X)
    u[..., 0] = X[..., 0] * X[..., 1]
    u[..., 2] = X[..., 2]
    rho = np.linspace(0.2, 1.0, grid.n_cells).reshape(
        grid.nels[::-1]).transpose(2, 1, 0)  # x-fastest flat order

    sf = voxel_stresses(grid, u, rho, E0, Emin, nu, p)
    assert sf.qp_stresses.shape == (grid.n_cells, 8, 6)
    assert sf.avg_stresses.shape == (grid.n_cells, 6)

    spacing = np.asarray(grid.spacing)
    rho_flat = rho.transpose(2, 1, 0).reshape(-1)
    nx, ny, nz = grid.nels
    for cell in range(grid.n_cells):
        i = cell % nx
        j = (cell // nx) % ny
        k = cell // (nx * ny)
        lo = np.array(grid.origin) + np.array([i, j, k]) * spacing
        pts = _gauss_physical_points(lo, spacing)
        E = Emin + rho_flat[cell] ** p * (E0 - Emin)
        lam = E * nu / ((1 + nu) * (1 - 2 * nu))
        mu = E / (2 * (1 + nu))
        ref = np.zeros((8, 6))
        exx, ezz = pts[:, 1], np.ones(8)
        tr = exx + ezz
        ref[:, 0] = lam * tr + 2 * mu * exx
        ref[:, 1] = lam * tr
        ref[:, 2] = lam * tr + 2 * mu * ezz
        ref[:, 3] = mu * pts[:, 0]          # sigma_xy = mu * gamma_xy
        # row-for-row: the library's qp order is x-fastest (2x2x2 Gauss),
        # matching _gauss_physical_points
        np.testing.assert_allclose(sf.qp_stresses[cell], ref,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(sf.avg_stresses[cell], ref.mean(axis=0),
                                   rtol=1e-10, atol=1e-12)


def test_voxel_dict_view_semantics():
    """StressField reproduces the reference's Dict{cell -> [sigma_qp]}
    access pattern (keys / len / __getitem__)."""
    grid = et.generate_grid((2, 2, 2))
    u = np.zeros((3, 3, 3, 3))
    u[..., 1] = 0.1 * _node_coord_field(grid)[..., 0]
    rho = np.full(grid.nels, 0.5)
    sf = voxel_stresses(grid, u, rho, 200.0, 1e-6, 0.3, 3.0)
    assert len(sf) == grid.n_cells
    assert list(sf.keys()) == list(range(grid.n_cells))
    for cell in sf.keys():
        assert sf[cell].shape == (8, 6)


def test_tet_qp_stresses_constant_strain():
    """Constant-strain tets: four IDENTICAL qp tensors per cell (the
    reference's QuadratureRule{RefTetrahedron}(2) Dict shape,
    FiniteElementAnalysis.jl:142), values from the analytic Lame relation
    for a linear displacement field."""
    from test_unstructured import tet_mesh_from_voxels

    E0, Emin, nu, p = 150.0, 1e-6, 0.25, 3.0
    mesh = tet_mesh_from_voxels((2, 2, 2))
    M = np.array([[0.02, 0.01, 0.0],
                  [0.0, -0.03, 0.015],
                  [0.005, 0.0, 0.04]])
    u = (mesh.node_coords @ M.T).reshape(-1)
    rng = np.random.default_rng(7)
    rho = rng.uniform(0.2, 1.0, mesh.n_cells)

    sf = unstructured_stresses(mesh, u, rho, E0, Emin, nu, p)
    assert sf.qp_stresses.shape == (mesh.n_cells, 4, 6)
    # all four qp tensors identical per cell
    np.testing.assert_allclose(sf.qp_stresses,
                               np.repeat(sf.avg_stresses[:, None, :], 4,
                                         axis=1), rtol=0, atol=0)

    eps_t = 0.5 * (M + M.T)
    gamma = np.array([eps_t[0, 0], eps_t[1, 1], eps_t[2, 2],
                      2 * eps_t[0, 1], 2 * eps_t[1, 2], 2 * eps_t[0, 2]])
    E = Emin + rho ** p * (E0 - Emin)
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    tr = gamma[0] + gamma[1] + gamma[2]
    ref = np.empty((mesh.n_cells, 6))
    for c in range(3):
        ref[:, c] = lam * tr + 2 * mu * gamma[c]
    for c in range(3, 6):
        ref[:, c] = mu * gamma[c]
    np.testing.assert_allclose(sf.avg_stresses, ref, rtol=1e-10, atol=1e-14)
