"""Stress recovery and von Mises computation.

Replaces `calculate_stresses_simp` and friends
(src/FiniteElementAnalysis/FiniteElementAnalysis.jl:532-597) with a fully
batched computation: strains at all Gauss points of all elements come from one
einsum against the precomputed B matrices; no per-cell loop.

Deliberate deviation (documented per SURVEY.md §7): the reference exports von
Mises from the FIRST quadrature point only (PostProcessing.jl:211) while its
max-tracking uses the cell-averaged stress (FiniteElementAnalysis.jl:584-589).
We use the cell-averaged stress for BOTH — it is symmetric under grid
reflections and strictly more informative; max-tracking parity is preserved.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .ops.elements import hex8_b_matrices, lame_parameters, simp_youngs_modulus

__all__ = ["StressField", "voxel_stresses", "unstructured_stresses",
           "von_mises_from_voigt"]

_VOIGT_TR = slice(0, 3)


@dataclass
class StressField:
    """Per-element quadrature-point stresses in Voigt order
    (xx, yy, zz, xy, yz, xz).  Mapping-style access gives the reference's
    Dict{cell -> [sigma_qp]} view."""

    qp_stresses: np.ndarray     # (n_cells, n_qp, 6)
    avg_stresses: np.ndarray    # (n_cells, 6)
    von_mises: np.ndarray       # (n_cells,) from cell-averaged stress
    max_von_mises: float
    max_vm_cell: int

    def __getitem__(self, cell_id: int) -> np.ndarray:
        return self.qp_stresses[cell_id]

    def __len__(self) -> int:
        return self.qp_stresses.shape[0]

    def keys(self):
        return range(len(self))


def von_mises_from_voigt(sig):
    """sqrt(3/2 dev(s):dev(s)) for Voigt stresses (..., 6)."""
    sxx, syy, szz = sig[..., 0], sig[..., 1], sig[..., 2]
    sxy, syz, sxz = sig[..., 3], sig[..., 4], sig[..., 5]
    return jnp.sqrt(
        jnp.maximum(
            0.0,
            sxx**2 + syy**2 + szz**2
            - sxx * syy - syy * szz - szz * sxx
            + 3.0 * (sxy**2 + syz**2 + sxz**2),
        )
    )


def voxel_stress_arrays(grid, u_field, rho_phys, E0, Emin, nu, p,
                        material_model=None):
    """Device-side batched stress recovery on the voxel grid.

    Returns (qp_stresses (nx,ny,nz,8,6), avg (nx,ny,nz,6), vm (nx,ny,nz)).
    sigma = lambda tr(eps) I + 2 mu eps evaluated per Gauss point with the
    SIMP-scaled moduli — the same constitutive relation as
    `calculate_stress_at_quadrature_points` (FiniteElementAnalysis.jl:537-555).
    """
    from .ops.operator import gather_element_dofs

    dtype = u_field.dtype
    B, _ = hex8_b_matrices(grid.spacing)
    B = jnp.asarray(B, dtype=dtype)                        # (8, 6, 24)
    ue = gather_element_dofs(u_field)                      # (nx,ny,nz,24)
    # Voigt ENGINEERING strains at each qp: eps = B @ ue
    eps = jnp.einsum("qck,...k->...qc", B, ue)             # (nx,ny,nz,8,6)
    if material_model is not None:
        # variable-material branch: the reference passes its material
        # closure into calculate_stresses_simp the same way
        # (FiniteElementAnalysis.jl:567-580)
        lam, mu = material_model(rho_phys)
    else:
        E = simp_youngs_modulus(rho_phys, E0, Emin, p)
        lam, mu = lame_parameters(E, nu)
    tr = jnp.sum(eps[..., _VOIGT_TR], axis=-1)             # (nx,ny,nz,8)
    sig = jnp.empty_like(eps)
    lam_q = lam[..., None]
    mu_q = mu[..., None]
    sig = sig.at[..., 0:3].set(
        lam_q[..., None] * tr[..., None] + 2.0 * mu_q[..., None] * eps[..., 0:3]
    )
    # engineering shear gamma -> tensor shear = gamma/2; sigma_shear = mu*gamma
    sig = sig.at[..., 3:6].set(mu_q[..., None] * eps[..., 3:6])
    avg = jnp.mean(sig, axis=-2)
    vm = von_mises_from_voigt(avg)
    return sig, avg, vm


def _von_mises_np(sig):
    sxx, syy, szz = sig[..., 0], sig[..., 1], sig[..., 2]
    sxy, syz, sxz = sig[..., 3], sig[..., 4], sig[..., 5]
    return np.sqrt(np.maximum(
        0.0,
        sxx**2 + syy**2 + szz**2 - sxx * syy - syy * szz - szz * sxx
        + 3.0 * (sxy**2 + syz**2 + sxz**2)))


def unstructured_stresses(mesh, u_flat, rho_phys, E0, Emin, nu, p,
                          material_model=None) -> StressField:
    """Host-side (numpy float64) stress recovery for imported meshes.

    One-shot per run (final analysis / checkpoint exports), so host numpy is
    the right cost/complexity point; batched over all elements.
    material_model: optional rho -> (lam, mu) closure — the reference passes
    its material closure into calculate_stresses_simp the same way
    (FiniteElementAnalysis.jl:567-580).
    """
    from .ops.elements import (
        _b_matrix_batch_np,
        _gauss_points_2x2x2,
        _hex8_shape_gradients_ref,
    )

    coords = mesh.node_coords[mesh.connectivity]       # (E, nn, 3)
    nn = coords.shape[1]
    dofmap = (3 * mesh.connectivity[:, :, None] + np.arange(3)).reshape(
        mesh.n_cells, -1)
    ue = np.asarray(u_flat, dtype=np.float64)[dofmap]  # (E, 3nn)

    if material_model is not None:
        lam, mu = material_model(np.asarray(rho_phys, dtype=np.float64))
        lam = np.asarray(lam, dtype=np.float64)
        mu = np.asarray(mu, dtype=np.float64)
    else:
        E_arr = simp_youngs_modulus(np.asarray(rho_phys, dtype=np.float64),
                                    E0, Emin, p)
        lam, mu = lame_parameters(E_arr, nu)

    def sigma_from_eps(eps):
        tr = eps[..., 0] + eps[..., 1] + eps[..., 2]
        sig = np.empty_like(eps)
        for c in range(3):
            sig[..., c] = lam * tr + 2.0 * mu * eps[..., c]
        for c in range(3, 6):
            sig[..., c] = mu * eps[..., c]   # engineering shear
        return sig

    if nn == 4:
        J = coords[:, 1:4, :] - coords[:, 0:1, :]
        invJ = np.linalg.inv(J)
        dNdL = np.array([[-1.0, -1.0, -1.0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
        dNdx = np.einsum("ai,nxi->nax", dNdL, invJ)
        B = _b_matrix_batch_np(dNdx)                   # (E, 6, 12)
        eps = np.einsum("nck,nk->nc", B, ue)
        sig = sigma_from_eps(eps)
        # Constant-strain tets: one evaluation, but the reference's
        # QuadratureRule{RefTetrahedron}(2) has FOUR quadrature points
        # (FiniteElementAnalysis.jl:142), so its Dict{cell -> [sigma_qp]}
        # holds four (identical) tensors per tet — reproduce the shape.
        qp = np.repeat(sig[:, None, :], 4, axis=1)
        avg = sig
    else:
        pts, wts = _gauss_points_2x2x2()
        qps = []
        for q in range(8):
            dNdxi = _hex8_shape_gradients_ref(pts[q])
            Jq = np.einsum("ai,naj->nij", dNdxi, coords)
            invJ = np.linalg.inv(Jq)
            dNdx = np.einsum("ai,nxi->nax", dNdxi, invJ)
            B = _b_matrix_batch_np(dNdx)
            eps = np.einsum("nck,nk->nc", B, ue)
            qps.append(sigma_from_eps(eps))
        qp = np.stack(qps, axis=1)                     # (E, 8, 6)
        avg = qp.mean(axis=1)

    vm = _von_mises_np(avg)
    imax = int(np.argmax(vm))
    return StressField(
        qp_stresses=qp,
        avg_stresses=avg,
        von_mises=vm,
        max_von_mises=float(vm[imax]),
        max_vm_cell=imax,
    )


def voxel_stresses(grid, u_field, rho_phys, E0, Emin, nu, p,
                   material_model=None) -> StressField:
    """Host-facing stress recovery; flattens to x-fastest cell numbering."""
    sig, avg, vm = voxel_stress_arrays(grid, u_field, rho_phys, E0, Emin, nu,
                                       p, material_model)
    sig = np.asarray(sig)
    sig_flat = sig.transpose(2, 1, 0, 3, 4).reshape(grid.n_cells, 8, 6)
    avg_flat = np.asarray(avg).transpose(2, 1, 0, 3).reshape(-1, 6)
    vm_flat = np.asarray(vm).transpose(2, 1, 0).reshape(-1)
    imax = int(np.argmax(vm_flat))
    return StressField(
        qp_stresses=sig_flat,
        avg_stresses=avg_flat,
        von_mises=vm_flat,
        max_von_mises=float(vm_flat[imax]),
        max_vm_cell=imax,
    )
