"""Independent reference implementation for parity testing.

A direct, dense/sparse float64 implementation of the Julia reference's
algorithm (EasySIMP.jl), written from its FORMULAS — not its code, and not
sharing derivations with the library under test:

  * element stiffness via the tensor form ke[(a,c),(b,d)] =
    integral( lambda g_a[c] g_b[d] + mu delta_cd (g_a.g_b) + mu g_a[d] g_b[c] )
    — the contraction eps_i : (lambda tr(eps_j) I + 2 mu eps_j) expanded in
    closed form (the library uses the Voigt B-matrix form instead);
  * sparse global assembly + row/column elimination for Dirichlet BCs +
    scipy direct solve (the CHOLMOD stand-in);
  * literal neighbor-list filters with the cone weight and volume divisions
    exactly as SensitivityFilter.jl / DensityFilter.jl write them;
  * literal OC bisection loop (OptimalityCriteria.jl:69-146).

This lets the tests hold the jitted matrix-free pipeline to compliance
rtol <= 1e-6 against a direct solver over a full optimization trajectory.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

GAUSS_1D = (-1.0 / np.sqrt(3.0), 1.0 / np.sqrt(3.0))

# VTK hex corner signs, same node order as the library.
HEX_SIGNS = np.array(
    [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
     [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], dtype=np.float64
)


def lame(E, nu):
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    return lam, mu


def hex_shape_gradients(coords, xi):
    """Physical shape gradients g_a (8,3) and detJ at reference point xi."""
    s = HEX_SIGNS
    dN = np.empty((8, 3))
    dN[:, 0] = 0.125 * s[:, 0] * (1 + s[:, 1] * xi[1]) * (1 + s[:, 2] * xi[2])
    dN[:, 1] = 0.125 * s[:, 1] * (1 + s[:, 0] * xi[0]) * (1 + s[:, 2] * xi[2])
    dN[:, 2] = 0.125 * s[:, 2] * (1 + s[:, 0] * xi[0]) * (1 + s[:, 1] * xi[1])
    J = dN.T @ coords                     # J[i, j] = d x_j / d xi_i
    detJ = np.linalg.det(J)
    g = dN @ np.linalg.inv(J).T           # g_a[j] = dN_a/dx_j
    return g, detJ


def tet_shape_gradients(coords):
    """Constant gradients g_a (4,3) and volume of a linear tet."""
    J = coords[1:] - coords[0]            # rows are edges; J[i,j] = dx_j/dL_i
    vol = np.linalg.det(J) / 6.0
    dN = np.array([[-1.0, -1.0, -1.0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = dN @ np.linalg.inv(J).T
    return g, vol


def element_stiffness_tensor_form(coords, E, nu):
    """ke via the expanded tensor contraction (independent derivation)."""
    lam, mu = lame(E, nu)
    n = coords.shape[0]
    ke = np.zeros((3 * n, 3 * n))

    def accumulate(g, w):
        nonlocal ke
        # lam * g_a[c] g_b[d]
        gf = g.reshape(-1)                               # (3n,) index (a,c)
        ke_l = np.outer(gf, gf) * lam
        # mu * delta_cd * (g_a . g_b)
        gg = g @ g.T                                     # (n, n)
        ke_m1 = np.kron(gg, np.eye(3)) * mu
        # mu * g_a[d] g_b[c]
        ke_m2 = mu * np.einsum("ad,bc->acbd", g, g).reshape(3 * n, 3 * n)
        ke += w * (ke_l + ke_m1 + ke_m2)

    if n == 8:
        for gz in GAUSS_1D:
            for gy in GAUSS_1D:
                for gx in GAUSS_1D:
                    g, detJ = hex_shape_gradients(coords, (gx, gy, gz))
                    accumulate(g, detJ)
    elif n == 4:
        g, vol = tet_shape_gradients(coords)
        accumulate(g, vol)
    else:
        raise ValueError(f"unsupported element with {n} nodes")
    return 0.5 * (ke + ke.T)


def element_volume(coords):
    if coords.shape[0] == 4:
        return tet_shape_gradients(coords)[1]
    v = 0.0
    for gz in GAUSS_1D:
        for gy in GAUSS_1D:
            for gx in GAUSS_1D:
                v += hex_shape_gradients(coords, (gx, gy, gz))[1]
    return v


def shape_value_integrals(coords):
    """integral(N_a dOmega) per node — the body-force weights
    (FiniteElementAnalysis.jl:486-526).  Linear tet: V/4 per node."""
    n = coords.shape[0]
    if n == 4:
        return np.full(4, tet_shape_gradients(coords)[1] / 4.0)
    out = np.zeros(8)
    s = HEX_SIGNS
    for gz in GAUSS_1D:
        for gy in GAUSS_1D:
            for gx in GAUSS_1D:
                N = 0.125 * (1 + s[:, 0] * gx) * (1 + s[:, 1] * gy) \
                    * (1 + s[:, 2] * gz)
                out += N * hex_shape_gradients(coords, (gx, gy, gz))[1]
    return out


class ReferenceProblem:
    """Sparse-assembled FE problem with per-element unit ke cache."""

    def __init__(self, points, conn, E0, Emin, nu, p):
        self.points = np.asarray(points, dtype=np.float64)
        self.conn = np.asarray(conn, dtype=np.int64)
        self.E0, self.Emin, self.nu, self.p = E0, Emin, nu, p
        self.n_nodes = self.points.shape[0]
        self.n_dofs = 3 * self.n_nodes
        n_el, nn = self.conn.shape
        self.ke_unit = np.stack(
            [element_stiffness_tensor_form(self.points[c], 1.0, nu)
             for c in self.conn]
        )
        self.volumes = np.array(
            [element_volume(self.points[c]) for c in self.conn]
        )
        dof = (3 * self.conn[:, :, None] + np.arange(3)).reshape(n_el, 3 * nn)
        self.rows = np.repeat(dof, 3 * nn, axis=1).reshape(-1)
        self.cols = np.tile(dof, (1, 3 * nn)).reshape(-1)
        self.dofmap = dof

    def youngs(self, rho):
        return self.Emin + (self.E0 - self.Emin) * rho**self.p

    def assemble(self, rho):
        vals = (self.youngs(rho)[:, None, None] * self.ke_unit).reshape(-1)
        K = sp.coo_matrix(
            (vals, (self.rows, self.cols)), shape=(self.n_dofs, self.n_dofs)
        ).tocsc()
        return K

    def apply_bcs(self, K, f, fixed_dofs):
        """Row/col elimination with unit diagonal (homogeneous Dirichlet)."""
        K = K.tolil()
        K[fixed_dofs, :] = 0.0
        K[:, fixed_dofs] = 0.0
        for d in fixed_dofs:
            K[d, d] = 1.0
        f = f.copy()
        f[fixed_dofs] = 0.0
        return K.tocsc(), f

    def solve(self, rho, f, fixed_dofs):
        K, fb = self.apply_bcs(self.assemble(rho), f, fixed_dofs)
        u = spla.spsolve(K, fb)
        energy = 0.5 * u @ (K @ u)
        return u, energy

    def sensitivities(self, rho, u):
        """dc/drho = -p rho^(p-1) (E0-Emin) u_e^T ke_unit u_e."""
        ue = u[self.dofmap]                               # (E, d)
        quad = np.einsum("ei,eij,ej->e", ue, self.ke_unit, ue)
        return -self.p * rho ** (self.p - 1) * (self.E0 - self.Emin) * quad


# ---------------------------------------------------------------------------
# Literal filter implementations (cone weight, explicit volume divisions)
# ---------------------------------------------------------------------------

class ReferenceFilter:
    def __init__(self, cell_centers, volumes, radius):
        from scipy.spatial import cKDTree

        self.centers = np.asarray(cell_centers, dtype=np.float64)
        self.volumes = np.asarray(volumes, dtype=np.float64)
        self.radius = float(radius)
        tree = cKDTree(self.centers)
        self.neighbors = tree.query_ball_point(self.centers, r=self.radius)

    def _weights(self, i):
        idx = np.asarray(self.neighbors[i], dtype=np.int64)
        d = np.linalg.norm(self.centers[idx] - self.centers[i], axis=1)
        w = np.maximum(0.0, self.radius - d)
        return idx, w

    def sensitivity_filter(self, rho, sens):
        out = np.empty_like(sens)
        for i in range(len(sens)):
            idx, w = self._weights(i)
            num = np.sum(w * rho[idx] * sens[idx] / self.volumes[idx])
            den = np.sum(w)
            rho_safe = max(1e-3, rho[i])
            out[i] = (
                num / (rho_safe / self.volumes[i] * den)
                if den > 1e-12 else sens[i]
            )
        return out

    def density_filter(self, rho):
        out = np.empty_like(rho)
        for i in range(len(rho)):
            idx, w = self._weights(i)
            wv = w * self.volumes[idx]
            den = np.sum(wv)
            out[i] = np.sum(wv * rho[idx]) / den if den > 1e-12 else rho[i]
        return out

    def chain_rule(self, sens):
        out = np.zeros_like(sens)
        for i in range(len(sens)):
            idx, w = self._weights(i)
            den = np.sum(w * self.volumes[idx])
            if den > 1e-12:
                out[idx] += (w * self.volumes[idx] / den) * sens[i]
        return out


def oc_update_reference(densities, sens, vol_sens, target_vf, total_volume,
                        elem_vols, move=0.2, damping=0.5, density_filter=None):
    """Literal port of OptimalityCriteria.jl:69-146."""
    x_min = 1e-3
    lo, hi = 1e-9, 1e9
    tol = 1e-6
    target_volume = target_vf * total_volume
    new = densities.copy()
    lmid = np.nan
    for _ in range(200):
        lmid = 0.5 * (lo + hi)
        Be = np.abs(sens) / (lmid * vol_sens)
        ratio = densities * Be**damping
        new = np.maximum(
            x_min,
            np.maximum(densities - move,
                       np.minimum(1.0, np.minimum(densities + move, ratio))),
        )
        phys = density_filter(new) if density_filter is not None else new
        verr = np.dot(phys, elem_vols) - target_volume
        if abs(verr) < tol:
            break
        if verr > 0:
            lo = lmid
        else:
            hi = lmid
    return new, lmid


def simp_optimize_reference(points, conn, fixed_dofs, f_ext, *, E0, Emin, nu,
                            p, volume_fraction, max_iterations, tolerance,
                            filter_radius_ratio, filter_type="sensitivity",
                            move=0.2, damping=0.5, char_size=None,
                            body_force=None):
    """Full reference SIMP loop (Optimization.jl:178-565 semantics).

    body_force: optional (accel_vec, base_density) — per-iteration
    variable-density volume force f_a += rho_e * base_density *
    integral(N_a) * accel with the rho < 1e-6 skip
    (FiniteElementAnalysis.jl:486-526, driven at Optimization.jl:301-311).

    Returns dict with per-iteration energy/volume/change histories, the
    density history, and the final state.
    """
    prob = ReferenceProblem(points, conn, E0, Emin, nu, p)

    if body_force is not None:
        accel = np.asarray(body_force[0], dtype=np.float64)
        base_density = float(body_force[1])
        shape_ints = np.stack(
            [shape_value_integrals(np.asarray(points)[c]) for c in conn])

        def apply_body_force(f, phys):
            f = f.copy()
            w = np.where(phys < 1e-6, 0.0, phys) * base_density
            fe = (w[:, None] * shape_ints)[:, :, None] * accel  # (E, nn, 3)
            np.add.at(f, prob.dofmap, fe.reshape(fe.shape[0], -1))
            return f
    else:
        apply_body_force = lambda f, phys: f
    centers = np.stack([points[c].mean(axis=0) for c in conn])
    if char_size is None:
        # average size of first 10 cells; hex = geometric mean of 3 edges,
        # tet = mean of 6 edges (FilterCommon.jl:109-182)
        sizes = []
        for c in conn[:10]:
            x = points[c]
            if len(c) == 8:
                sizes.append(
                    (np.linalg.norm(x[1] - x[0]) * np.linalg.norm(x[3] - x[0])
                     * np.linalg.norm(x[4] - x[0])) ** (1 / 3)
                )
            else:
                e = [np.linalg.norm(x[j] - x[i])
                     for i in range(4) for j in range(i + 1, 4)]
                sizes.append(np.mean(e))
        char_size = float(np.mean(sizes))
    radius = filter_radius_ratio * char_size
    filt = ReferenceFilter(centers, prob.volumes, radius)
    use_density = filter_type == "density"

    total_volume = prob.volumes.sum()
    vol_sens_phys = prob.volumes / total_volume
    vol_sens = filt.chain_rule(vol_sens_phys) if use_density else vol_sens_phys

    rho = np.full(conn.shape[0], volume_fraction)
    energies, volumes, changes = [], [], []
    density_history = []
    converged = False
    u = np.zeros(prob.n_dofs)

    for it in range(1, max_iterations + 1):
        phys = filt.density_filter(rho) if use_density else rho
        u, energy = prob.solve(phys, apply_body_force(f_ext, phys),
                               fixed_dofs)
        energies.append(energy)
        volumes.append(float(np.dot(phys, prob.volumes)))

        sens = prob.sensitivities(phys, u)
        if use_density:
            fsens = filt.chain_rule(sens)
            dfilter = filt.density_filter
        else:
            fsens = filt.sensitivity_filter(rho, sens)
            dfilter = None
        new, lam = oc_update_reference(
            rho, fsens, vol_sens, volume_fraction, total_volume, prob.volumes,
            move, damping, density_filter=dfilter,
        )
        change = float(np.max(np.abs(new - rho)))
        changes.append(change)
        rho = new
        density_history.append(rho.copy())
        if change < tolerance:
            converged = True
            break

    phys = filt.density_filter(rho) if use_density else rho
    u, final_energy = prob.solve(phys, apply_body_force(f_ext, phys),
                                 fixed_dofs)
    return {
        "energies": energies,
        "volumes": volumes,
        "changes": changes,
        "density_history": density_history,
        "final_densities": phys,
        "final_u": u,
        "final_energy": final_energy,
        "converged": converged,
        "total_volume": total_volume,
        "filter_radius": radius,
    }
