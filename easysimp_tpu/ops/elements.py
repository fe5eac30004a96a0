"""Element-level math: SIMP material law and element stiffness matrices.

TPU-first design: instead of the reference's per-cell quadrature loop inside a
CellIterator (src/FiniteElementAnalysis/FiniteElementAnalysis.jl:174-193), the
voxel path precomputes ONE reference 24x24 stiffness for the uniform box
element at E=1 on the host in float64 and scales it per element by E(rho) on
device — valid because ke is linear in E at fixed Poisson ratio, the same
invariant the reference's element cache exploits
(FiniteElementAnalysis.jl:678-712).  The unstructured path computes batched
per-element ke with vmapped isoparametric quadrature.

Node ordering is the VTK/Ferrite hexahedron order; local dofs are node-major
(node a's dofs at 3a..3a+2), matching Ferrite's vectorized Lagrange layout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "HEX_CORNERS",
    "lame_parameters",
    "create_material_model",
    "create_simp_material_model",
    "simp_youngs_modulus",
    "elasticity_matrix",
    "hex8_stiffness",
    "hex8_b_matrices",
    "tet4_stiffness_batch",
    "hex8_stiffness_batch",
    "element_stiffness_batch_np",
    "element_stiffness_lame_basis_batch_np",
    "shape_integrals_batch_np",
]

# VTK / Ferrite RefHexahedron vertex order, as unit-cube corner offsets.
# Reference cell connectivity follows this order (Ferrite.Hexahedron).
HEX_CORNERS = (
    (0, 0, 0),
    (1, 0, 0),
    (1, 1, 0),
    (0, 1, 0),
    (0, 0, 1),
    (1, 0, 1),
    (1, 1, 1),
    (0, 1, 1),
)

# Corner signs in the reference element [-1, 1]^3 (same order).
_XI = np.array([[2 * c[0] - 1, 2 * c[1] - 1, 2 * c[2] - 1] for c in HEX_CORNERS],
               dtype=np.float64)


def lame_parameters(E, nu):
    """(lambda, mu) from Young's modulus and Poisson ratio.

    Mirrors `compute_lame_parameters` (FiniteElementAnalysis.jl:52-56)."""
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = E / (2.0 * (1.0 + nu))
    return lam, mu


def create_material_model(E, nu):
    """API parity with reference `create_material_model`
    (FiniteElementAnalysis.jl:79-81): returns the (lambda, mu) tuple."""
    return lame_parameters(E, nu)


def simp_youngs_modulus(rho, E0, Emin, p):
    """SIMP law E(rho) = Emin + (E0 - Emin) * rho^p
    (FiniteElementAnalysis.jl:100-112)."""
    return Emin + (E0 - Emin) * rho**p


def create_simp_material_model(E0, nu, Emin=1e-6, p=3.0):
    """Returns rho -> (lambda, mu), parity with
    `create_simp_material_model` (FiniteElementAnalysis.jl:100-112)."""

    def material_for_density(rho):
        return lame_parameters(simp_youngs_modulus(rho, E0, Emin, p), nu)

    return material_for_density


def elasticity_matrix(E, nu):
    """6x6 isotropic elasticity matrix in Voigt order
    (xx, yy, zz, xy, yz, xz) with engineering shear strains."""
    lam, mu = lame_parameters(E, nu)
    D = np.zeros((6, 6), dtype=np.float64)
    D[:3, :3] = lam
    D[0, 0] = D[1, 1] = D[2, 2] = lam + 2.0 * mu
    D[3, 3] = D[4, 4] = D[5, 5] = mu
    return D


def _gauss_points_2x2x2():
    g = 1.0 / np.sqrt(3.0)
    pts = np.array(
        [[sx * g, sy * g, sz * g]
         for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)],
        dtype=np.float64,
    )
    wts = np.ones(8, dtype=np.float64)
    return pts, wts


def _hex8_shape_gradients_ref(xi):
    """d N_a / d xi at reference point xi, shape (8, 3)."""
    xi = np.asarray(xi, dtype=np.float64)
    grads = np.empty((8, 3), dtype=np.float64)
    for a in range(8):
        sx, sy, sz = _XI[a]
        grads[a, 0] = 0.125 * sx * (1 + sy * xi[1]) * (1 + sz * xi[2])
        grads[a, 1] = 0.125 * sy * (1 + sx * xi[0]) * (1 + sz * xi[2])
        grads[a, 2] = 0.125 * sz * (1 + sx * xi[0]) * (1 + sy * xi[1])
    return grads


def _b_matrix(dNdx):
    """Strain-displacement matrix (6, 3*n) from physical shape gradients
    (n, 3), Voigt order (xx, yy, zz, xy, yz, xz), engineering shear."""
    n = dNdx.shape[0]
    B = np.zeros((6, 3 * n), dtype=np.float64)
    for a in range(n):
        dx, dy, dz = dNdx[a]
        B[0, 3 * a + 0] = dx
        B[1, 3 * a + 1] = dy
        B[2, 3 * a + 2] = dz
        B[3, 3 * a + 0] = dy
        B[3, 3 * a + 1] = dx
        B[4, 3 * a + 1] = dz
        B[4, 3 * a + 2] = dy
        B[5, 3 * a + 0] = dz
        B[5, 3 * a + 2] = dx
    return B


def hex8_b_matrices(spacing):
    """B matrices and integration weights for the uniform box element.

    Returns (B, w): B is (8, 6, 24) — one strain-displacement matrix per
    2x2x2 Gauss point — and w the (8,) integration weights (detJ * gauss
    weight).  Used for stiffness, stress recovery, and element energies.
    """
    hx, hy, hz = (float(s) for s in spacing)
    pts, wts = _gauss_points_2x2x2()
    detJ = (hx * hy * hz) / 8.0
    inv_scale = np.array([2.0 / hx, 2.0 / hy, 2.0 / hz], dtype=np.float64)
    B = np.empty((8, 6, 24), dtype=np.float64)
    w = np.empty(8, dtype=np.float64)
    for q in range(8):
        dNdx = _hex8_shape_gradients_ref(pts[q]) * inv_scale[None, :]
        B[q] = _b_matrix(dNdx)
        w[q] = wts[q] * detJ
    return B, w


def elasticity_matrix_lame(lam, mu):
    """6x6 isotropic elasticity matrix directly from Lamé parameters.

    D is LINEAR in (lam, mu): D = lam * D_lam + mu * D_mu with constant
    basis matrices — the invariant behind the two-field variable-material
    operator (ke(lam, mu) = lam * ke_lam + mu * ke_mu).
    """
    D = np.zeros((6, 6), dtype=np.float64)
    D[:3, :3] = lam
    D[0, 0] = D[1, 1] = D[2, 2] = lam + 2.0 * mu
    D[3, 3] = D[4, 4] = D[5, 5] = mu
    return D


def hex8_stiffness_lame_basis(spacing):
    """(ke_lam, ke_mu): 24x24 basis stiffnesses of the uniform box element
    at (lam, mu) = (1, 0) and (0, 1), float64 host-side.

    ke(lam, mu) = lam * ke_lam + mu * ke_mu exactly — the TPU-native
    replacement for the reference's per-cell variable-material re-assembly
    (`assemble_variable_material!`, FiniteElementAnalysis.jl:719-743):
    instead of recomputing a 24x24 quadrature per cell per iteration, the
    matvec contracts two constant kes against two per-element Lamé fields.
    """
    B, w = hex8_b_matrices(spacing)
    kes = []
    for lam, mu in ((1.0, 0.0), (0.0, 1.0)):
        D = elasticity_matrix_lame(lam, mu)
        ke = np.zeros((24, 24), dtype=np.float64)
        for q in range(8):
            ke += w[q] * (B[q].T @ D @ B[q])
        kes.append(0.5 * (ke + ke.T))
    return kes[0], kes[1]


def hex8_stiffness(spacing, E=1.0, nu=0.3):
    """24x24 stiffness of an axis-aligned box element (hx, hy, hz).

    float64 host-side computation with exact 2x2x2 Gauss quadrature —
    the single reference `ke` that the voxel matrix-free operator scales by
    E(rho) per element (the TPU replacement for the reference's
    `initialize_element_cache`, FiniteElementAnalysis.jl:608-630).
    """
    B, w = hex8_b_matrices(spacing)
    D = elasticity_matrix(E, nu)
    ke = np.zeros((24, 24), dtype=np.float64)
    for q in range(8):
        ke += w[q] * (B[q].T @ D @ B[q])
    return 0.5 * (ke + ke.T)


# ---------------------------------------------------------------------------
# Unstructured batched elements (device-side, vmappable)
# ---------------------------------------------------------------------------

def _elasticity_matrix_jnp(E, nu, dtype):
    lam, mu = lame_parameters(E, nu)
    D = jnp.zeros((6, 6), dtype=dtype)
    D = D.at[:3, :3].set(lam)
    D = D.at[jnp.arange(3), jnp.arange(3)].set(lam + 2.0 * mu)
    D = D.at[jnp.arange(3, 6), jnp.arange(3, 6)].set(mu)
    return D


def tet4_stiffness_batch(coords, E=1.0, nu=0.3):
    """Batched constant-strain tet4 stiffness: coords (n, 4, 3) -> (n, 12, 12).

    Linear tetrahedra have constant shape gradients, so the quadrature loop
    of the reference (FiniteElementAnalysis.jl:174-193 with RefTetrahedron)
    collapses to a single closed-form B^T D B * V per element — evaluated for
    the whole element batch at once (vmap-free einsum; MXU-friendly).
    Also returns the (n,) signed volumes.
    """
    coords = jnp.asarray(coords)
    dtype = coords.dtype
    # Edge matrix J = [x1-x0; x2-x0; x3-x0] (rows), volume = det(J)/6.
    J = coords[:, 1:4, :] - coords[:, 0:1, :]              # (n, 3, 3)
    detJ = jnp.linalg.det(J)                               # (n,)
    vol = detJ / 6.0
    invJ = jnp.linalg.inv(J)                               # (n, 3, 3)
    # Reference gradients of barycentric shape funcs wrt (L1, L2, L3):
    # N0 = 1 - L1 - L2 - L3, Ni = Li.  With J_ij = dx_j/dL_i we have
    # dL_i/dx_j = (J^{-1})_ji, so dN_a/dx_j = sum_i dNdL[a,i] * invJ[j,i].
    dNdL = jnp.array(
        [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )                                                      # (4, 3)
    dNdx = jnp.einsum("ai,nxi->nax", dNdL, invJ)           # (n, 4, 3)

    B = _b_matrix_batch(dNdx)                              # (n, 6, 12)
    D = _elasticity_matrix_jnp(E, nu, dtype)
    ke = jnp.einsum("nia,ij,njb,n->nab", B, D, B, vol)
    return 0.5 * (ke + jnp.swapaxes(ke, 1, 2)), vol


def _b_matrix_batch(dNdx):
    """Batched B: (n, a, 3) physical gradients -> (n, 6, 3a) Voigt matrix."""
    n, a, _ = dNdx.shape
    dtype = dNdx.dtype
    dx, dy, dz = dNdx[..., 0], dNdx[..., 1], dNdx[..., 2]   # (n, a)
    zero = jnp.zeros_like(dx)
    # rows of B per node: stack (6, 3) blocks then interleave into (6, 3a)
    blocks = jnp.stack(
        [
            jnp.stack([dx, zero, zero], axis=-1),
            jnp.stack([zero, dy, zero], axis=-1),
            jnp.stack([zero, zero, dz], axis=-1),
            jnp.stack([dy, dx, zero], axis=-1),
            jnp.stack([zero, dz, dy], axis=-1),
            jnp.stack([dz, zero, dx], axis=-1),
        ],
        axis=-2,
    )  # (n, a, 6, 3)
    return blocks.transpose(0, 2, 1, 3).reshape(n, 6, 3 * a).astype(dtype)


# ---------------------------------------------------------------------------
# Host-side (numpy, float64) batched elements — one-time precompute for the
# unstructured operator.  Always double precision regardless of the device
# dtype (the unit-ke cache is the analogue of the reference's
# initialize_element_cache and must not inherit fp32 truncation).
# ---------------------------------------------------------------------------

def _b_matrix_batch_np(dNdx):
    n, a, _ = dNdx.shape
    B = np.zeros((n, 6, 3 * a), dtype=np.float64)
    dx, dy, dz = dNdx[..., 0], dNdx[..., 1], dNdx[..., 2]
    idx = 3 * np.arange(a)
    B[:, 0, idx + 0] = dx
    B[:, 1, idx + 1] = dy
    B[:, 2, idx + 2] = dz
    B[:, 3, idx + 0] = dy
    B[:, 3, idx + 1] = dx
    B[:, 4, idx + 1] = dz
    B[:, 4, idx + 2] = dy
    B[:, 5, idx + 0] = dz
    B[:, 5, idx + 2] = dx
    return B


def element_stiffness_batch_np(coords, E=1.0, nu=0.3):
    """Batched unit-modulus ke in numpy float64.

    coords: (n, 4, 3) tet4 or (n, 8, 3) hex8 (VTK order).
    Returns (ke (n, d, d), volumes (n,)).
    """
    return _stiffness_batch_np(coords, elasticity_matrix(E, nu))


def element_stiffness_lame_basis_batch_np(coords):
    """Batched Lamé-basis stiffnesses: (ke_lam (n,d,d), ke_mu (n,d,d)).

    ke_e(lam, mu) = lam * ke_lam_e + mu * ke_mu_e exactly (D is linear in
    the Lamé parameters) — the unstructured analogue of
    `hex8_stiffness_lame_basis`, enabling the reference's variable-material
    branch (`assemble_variable_material!`, FiniteElementAnalysis.jl:719-743)
    on imported tet4/hex8 meshes without per-iteration re-quadrature.
    """
    kl, _ = _stiffness_batch_np(coords, elasticity_matrix_lame(1.0, 0.0))
    km, _ = _stiffness_batch_np(coords, elasticity_matrix_lame(0.0, 1.0))
    return kl, km


def _stiffness_batch_np(coords, D):
    """Batched ke for a fixed 6x6 elasticity matrix D; see
    element_stiffness_batch_np."""
    coords = np.asarray(coords, dtype=np.float64)
    n, nn, _ = coords.shape
    if nn == 4:
        J = coords[:, 1:4, :] - coords[:, 0:1, :]
        detJ = np.linalg.det(J)
        vol = detJ / 6.0
        invJ = np.linalg.inv(J)
        dNdL = np.array([[-1.0, -1.0, -1.0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
        dNdx = np.einsum("ai,nxi->nax", dNdL, invJ)
        B = _b_matrix_batch_np(dNdx)
        ke = np.einsum("nia,ij,njb,n->nab", B, D, B, vol)
    elif nn == 8:
        pts, wts = _gauss_points_2x2x2()
        ke = np.zeros((n, 24, 24), dtype=np.float64)
        vol = np.zeros(n, dtype=np.float64)
        for q in range(8):
            dNdxi = _hex8_shape_gradients_ref(pts[q])
            J = np.einsum("ai,naj->nij", dNdxi, coords)
            detJ = np.linalg.det(J)
            invJ = np.linalg.inv(J)
            dNdx = np.einsum("ai,nxi->nax", dNdxi, invJ)
            B = _b_matrix_batch_np(dNdx)
            w = wts[q] * detJ
            ke += np.einsum("nia,ij,njb,n->nab", B, D, B, w)
            vol += w
    else:
        raise ValueError(f"unsupported element with {nn} nodes")
    return 0.5 * (ke + ke.transpose(0, 2, 1)), vol


def shape_integrals_batch_np(coords):
    """integral(N_a) dOmega per element node, numpy float64: (n, nn).

    Used by the variable-density body force (the reference integrates this
    with cell quadrature per element, FiniteElementAnalysis.jl:504-517).
    """
    coords = np.asarray(coords, dtype=np.float64)
    n, nn, _ = coords.shape
    if nn == 4:
        J = coords[:, 1:4, :] - coords[:, 0:1, :]
        vol = np.linalg.det(J) / 6.0
        return np.repeat(vol[:, None] / 4.0, 4, axis=1)
    if nn == 8:
        pts, wts = _gauss_points_2x2x2()
        out = np.zeros((n, 8), dtype=np.float64)
        for q in range(8):
            xi = pts[q]
            s = _XI
            N = 0.125 * (1 + s[:, 0] * xi[0]) * (1 + s[:, 1] * xi[1]) \
                * (1 + s[:, 2] * xi[2])
            dNdxi = _hex8_shape_gradients_ref(xi)
            J = np.einsum("ai,naj->nij", dNdxi, coords)
            detJ = np.linalg.det(J)
            out += wts[q] * detJ[:, None] * N[None, :]
        return out
    raise ValueError(f"unsupported element with {nn} nodes")


def hex8_stiffness_batch(coords, E=1.0, nu=0.3):
    """Batched isoparametric hex8 stiffness: coords (n, 8, 3) -> (n, 24, 24).

    General (possibly distorted) hexahedra from imported meshes; 2x2x2 Gauss.
    Also returns the (n,) element volumes.
    """
    coords = jnp.asarray(coords)
    dtype = coords.dtype
    pts, wts = _gauss_points_2x2x2()
    ke = jnp.zeros((coords.shape[0], 24, 24), dtype=dtype)
    vol = jnp.zeros(coords.shape[0], dtype=dtype)
    D = _elasticity_matrix_jnp(E, nu, dtype)
    for q in range(8):
        dNdxi = jnp.asarray(_hex8_shape_gradients_ref(pts[q]), dtype=dtype)  # (8,3)
        # J_ij = d x_j / d xi_i = sum_a dN_a/dxi_i * x_a_j
        J = jnp.einsum("ai,naj->nij", dNdxi, coords)       # (n, 3, 3)
        detJ = jnp.linalg.det(J)
        invJ = jnp.linalg.inv(J)
        # dN_a/dx_j = sum_i dNdxi[a,i] * (J^{-1})_ji  (J_ij = dx_j/dxi_i)
        dNdx = jnp.einsum("ai,nxi->nax", dNdxi, invJ)      # (n, 8, 3)
        B = _b_matrix_batch(dNdx)                          # (n, 6, 24)
        w = wts[q] * detJ
        ke = ke + jnp.einsum("nia,ij,njb,n->nab", B, D, B, w)
        vol = vol + w
    return 0.5 * (ke + jnp.swapaxes(ke, 1, 2)), vol
