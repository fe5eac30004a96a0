"""Matrix-free stiffness operators.

TPU-native replacement for the reference's sparse assembly + CHOLMOD pipeline
(src/FiniteElementAnalysis/FiniteElementAnalysis.jl:637-712 feeding
`cholesky(Symmetric(K,:L)) \\ f` at src/Optimization/Optimization.jl:317):
the global K is never formed.  Its action on a node field is

    K u = scatter( E(rho)_e * (ke_ref @ u_e) )

which on the voxel grid maps to eight static-slice gathers, one large
(N, 24) @ (24, 24) matmul (MXU), and eight static-slice scatter-adds — no
indices, no sparse formats, fully fusable by XLA, and shardable over a device
mesh (the slice/pad pattern lets GSPMD insert halo exchanges automatically).

Dirichlet boundary conditions are masks: A(u) = M * K(M * u), with the
constrained subspace held exactly at zero (homogeneous BCs only, matching the
reference's Dirichlet (x,t)->0.0 constraints).

The unstructured path uses gather / batched-matmul / scatter-add with explicit
connectivity (see UnstructuredOperator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .elements import HEX_CORNERS, hex8_stiffness, simp_youngs_modulus

__all__ = [
    "gather_element_dofs",
    "scatter_element_dofs",
    "VoxelOperator",
    "UnstructuredOperator",
]


def gather_element_dofs(u):
    """Node field (nnx, nny, nnz, 3) -> element dof array (nx, ny, nz, 24).

    Local dof layout is node-major in VTK/Ferrite hex corner order, matching
    the reference ke layout from `hex8_stiffness`.
    """
    nx, ny, nz = u.shape[0] - 1, u.shape[1] - 1, u.shape[2] - 1
    parts = [
        u[dx : dx + nx, dy : dy + ny, dz : dz + nz, :] for dx, dy, dz in HEX_CORNERS
    ]
    return jnp.concatenate(parts, axis=-1)


def scatter_element_dofs(fe):
    """Transpose of `gather_element_dofs`: (nx, ny, nz, 24) -> node field."""
    nx, ny, nz = fe.shape[:3]
    out = jnp.zeros((nx + 1, ny + 1, nz + 1, 3), dtype=fe.dtype)
    for c, (dx, dy, dz) in enumerate(HEX_CORNERS):
        out = out.at[dx : dx + nx, dy : dy + ny, dz : dz + nz, :].add(
            fe[..., 3 * c : 3 * c + 3]
        )
    return out


class VoxelOperator:
    """Matrix-free K on a structured voxel grid.

    Holds only the single float64-precomputed reference element stiffness
    (cast to the working dtype) and the SIMP material constants.  All methods
    are pure jnp functions of their array arguments and jit/vmap/pjit-safe.
    """

    def __init__(self, grid, E0=1.0, Emin=1e-9, nu=0.3, p=3.0, dtype=jnp.float32):
        self.grid = grid
        self.E0 = float(E0)
        self.Emin = float(Emin)
        self.nu = float(nu)
        self.p = float(p)
        self.dtype = dtype
        ke64 = hex8_stiffness(grid.spacing, E=1.0, nu=self.nu)
        self.ke = jnp.asarray(ke64, dtype=dtype)
        # Per-corner diagonal 3-blocks of ke, used for the Jacobi diagonal.
        self.ke_diag = jnp.asarray(
            np.stack([np.diag(ke64)[3 * c : 3 * c + 3] for c in range(8)]),
            dtype=dtype,
        )  # (8, 3)
        # Per-corner |ke| row sums — Gershgorin data for the smoother's
        # lambda_max bound (see multigrid.py).
        rowabs = np.abs(ke64).sum(axis=1)
        self.ke_rowabs = jnp.asarray(
            np.stack([rowabs[3 * c : 3 * c + 3] for c in range(8)]),
            dtype=dtype,
        )  # (8, 3)

    # ----- material -------------------------------------------------------
    def youngs_modulus(self, rho):
        """E(rho): the per-element scaling of the unit-modulus ke."""
        return simp_youngs_modulus(rho, self.E0, self.Emin, self.p)

    def set_fused_matvec(self, fn):
        """Install a fused K@u implementation (e.g. the Pallas kernel from
        ops/pallas_kernels.py); apply_K routes through it."""
        self._fused_matvec = fn

    def set_fused_energies(self, fn):
        """Install a fused u_e^T ke u_e implementation (Pallas);
        element_energies_unit routes through it."""
        self._fused_energies = fn

    # ----- core stencil action --------------------------------------------
    def apply_elements(self, u):
        """Element dof products q_e = ke @ u_e, shape (nx, ny, nz, 24).

        Shared between the matvec and the compliance sensitivity
        (s_e needs u_e^T ke u_e; reference SensitivityAnalysis.jl:74-78).

        precision=HIGHEST is load-bearing: the TPU MXU's default bf16
        single-pass matmul floors the achievable CG residual at ~1e-3 and
        stalls the solver; the 3/6-pass fp32-accurate mode costs little here
        (the op is HBM-bandwidth-bound, not FLOP-bound).
        """
        ue = gather_element_dofs(u)
        shp = ue.shape
        # ke symmetric; (N,24)@(24,24) on the MXU
        q = jnp.dot(ue.reshape(-1, 24), self.ke,
                    precision=jax.lax.Precision.HIGHEST)
        return ue, q.reshape(shp)

    _fused_matvec = None
    _fused_energies = None

    def apply_K(self, u, scale):
        """K(rho) @ u with scale = E(rho), no BC masking."""
        if self._fused_matvec is not None:
            return self._fused_matvec(u, scale)
        _, q = self.apply_elements(u)
        return scatter_element_dofs(q * scale[..., None])

    def apply(self, u, scale, free_mask):
        """BC-masked SPD operator A u = M K (M u) on the free subspace."""
        return free_mask * self.apply_K(free_mask * u, scale)

    def diagonal(self, scale, free_mask):
        """diag(A) as a node field; 1.0 on constrained dofs.

        diag contribution of element e to its corner c is scale_e * ke[3c+i, 3c+i],
        accumulated with the same pad/scatter stencil as the matvec.
        """
        nx, ny, nz = self.grid.nels
        out = jnp.zeros((nx + 1, ny + 1, nz + 1, 3), dtype=scale.dtype)
        for c, (dx, dy, dz) in enumerate(HEX_CORNERS):
            out = out.at[dx : dx + nx, dy : dy + ny, dz : dz + nz, :].add(
                scale[..., None] * self.ke_diag[c][None, None, None, :]
            )
        return jnp.where(free_mask > 0, out, jnp.ones_like(out))

    def row_abs_sums(self, scale, free_mask):
        """Upper bound on global |K| row sums: sum_e scale_e |ke| row blocks,
        scattered like the diagonal.  Gershgorin: lambda_max(D^-1 A) <=
        max_i rowabs_i / diag_i.  1.0 on constrained dofs."""
        nx, ny, nz = self.grid.nels
        out = jnp.zeros((nx + 1, ny + 1, nz + 1, 3), dtype=scale.dtype)
        for c, (dx, dy, dz) in enumerate(HEX_CORNERS):
            out = out.at[dx : dx + nx, dy : dy + ny, dz : dz + nz, :].add(
                scale[..., None] * self.ke_rowabs[c][None, None, None, :]
            )
        return jnp.where(free_mask > 0, out, jnp.ones_like(out))

    def element_energies_unit(self, u):
        """u_e^T ke u_e per element (unit modulus), shape (nx, ny, nz)."""
        if self._fused_energies is not None:
            return self._fused_energies(u)
        ue, q = self.apply_elements(u)
        return jnp.sum(ue * q, axis=-1)

    # ----- variable-material (two-field Lamé) path ------------------------
    # TPU-native replacement for the reference's `assemble_variable_material!`
    # branch (use_cache=false, FiniteElementAnalysis.jl:719-743): ke is
    # LINEAR in (lam, mu), so an arbitrary per-element material is two
    # constant-ke contractions against two Lamé fields — no per-cell
    # quadrature, works for models where Poisson's ratio varies with density
    # (which the unit-ke scaling path cannot express).
    @property
    def ke_lame_basis(self):
        """(ke_lam, ke_mu) with ke(lam, mu) = lam*ke_lam + mu*ke_mu.

        Caches NUMPY (the jnp conversion happens per use: converting inside
        a trace returns tracers, and caching those leaks them across jits).
        """
        if not hasattr(self, "_ke_lame_np"):
            from .elements import hex8_stiffness_lame_basis

            self._ke_lame_np = hex8_stiffness_lame_basis(self.grid.spacing)
        kl, km = self._ke_lame_np
        return jnp.asarray(kl, dtype=self.dtype), jnp.asarray(km, self.dtype)

    def apply_K_lame(self, u, lam_field, mu_field):
        """K(lam, mu) @ u with per-element Lamé fields (nx, ny, nz)."""
        ke_lam, ke_mu = self.ke_lame_basis
        ue = gather_element_dofs(u)
        shp = ue.shape
        flat = ue.reshape(-1, 24)
        ql = jnp.dot(flat, ke_lam, precision=jax.lax.Precision.HIGHEST)
        qm = jnp.dot(flat, ke_mu, precision=jax.lax.Precision.HIGHEST)
        fe = (lam_field[..., None] * ql.reshape(shp)
              + mu_field[..., None] * qm.reshape(shp))
        return scatter_element_dofs(fe)

    def apply_lame(self, u, lam_field, mu_field, free_mask):
        """BC-masked SPD action of the variable-material operator."""
        return free_mask * self.apply_K_lame(free_mask * u, lam_field,
                                             mu_field)

    def diagonal_lame(self, lam_field, mu_field, free_mask):
        """diag of the masked variable-material K; 1.0 on constrained dofs."""
        ke_lam, ke_mu = self.ke_lame_basis
        nx, ny, nz = self.grid.nels
        out = jnp.zeros((nx + 1, ny + 1, nz + 1, 3), dtype=lam_field.dtype)
        for c, (dx, dy, dz) in enumerate(HEX_CORNERS):
            dl = jnp.diagonal(ke_lam)[3 * c: 3 * c + 3]
            dm = jnp.diagonal(ke_mu)[3 * c: 3 * c + 3]
            out = out.at[dx: dx + nx, dy: dy + ny, dz: dz + nz, :].add(
                lam_field[..., None] * dl[None, None, None, :]
                + mu_field[..., None] * dm[None, None, None, :]
            )
        return jnp.where(free_mask > 0, out, jnp.ones_like(out))

    def element_energies_lame(self, u):
        """(u_e^T ke_lam u_e, u_e^T ke_mu u_e) element fields — the exact
        material-derivative quadratics for variable-material sensitivities:
        dc/drho_e = -(lam'(rho) w_lam + mu'(rho) w_mu)."""
        ke_lam, ke_mu = self.ke_lame_basis
        ue = gather_element_dofs(u)
        flat = ue.reshape(-1, 24)
        shp = ue.shape[:-1]
        wl = jnp.sum(flat * jnp.dot(flat, ke_lam,
                                    precision=jax.lax.Precision.HIGHEST),
                     axis=-1).reshape(shp)
        wm = jnp.sum(flat * jnp.dot(flat, ke_mu,
                                    precision=jax.lax.Precision.HIGHEST),
                     axis=-1).reshape(shp)
        return wl, wm

    def compliance_sensitivities(self, u, rho_phys):
        """d(compliance)/d(rho_phys) = -p rho^(p-1) (E0-Emin) u_e^T ke u_e.

        Exact analogue of the reference `calculate_sensitivities!`
        (src/Optimization/SensitivityAnalysis.jl:31-80) — but the per-cell
        unit-ke re-integration loop is replaced by reusing the stencil gather
        and one batched matmul.
        """
        dE = self.p * rho_phys ** (self.p - 1.0) * (self.E0 - self.Emin)
        return -dE * self.element_energies_unit(u)


class UnstructuredOperator:
    """Matrix-free K for imported tet4/hex8 meshes.

    Precomputes the per-element unit-modulus stiffness batch (the analogue of
    `initialize_element_cache`, FiniteElementAnalysis.jl:608-630) and the
    (n_elem, ndof_e) dof map; the matvec is gather -> batched matmul ->
    scatter-add.  Vectors are flat (n_dofs,) with dof = 3*node + comp.
    """

    def __init__(self, ke_unit, connectivity, n_nodes, E0, Emin, nu, p,
                 dtype=jnp.float32):
        self.E0 = float(E0)
        self.Emin = float(Emin)
        self.nu = float(nu)
        self.p = float(p)
        self.dtype = dtype
        self.ke = jnp.asarray(ke_unit, dtype=dtype)          # (E, d, d)
        conn = np.asarray(connectivity, dtype=np.int32)      # (E, nn)
        dofmap = (3 * conn[:, :, None] + np.arange(3)[None, None, :]).reshape(
            conn.shape[0], -1
        )
        self.dofmap = jnp.asarray(dofmap)                    # (E, d)
        self.n_nodes = int(n_nodes)
        self.n_dofs = 3 * self.n_nodes

    def youngs_modulus(self, rho):
        return simp_youngs_modulus(rho, self.E0, self.Emin, self.p)

    def apply_elements(self, u):
        ue = u[self.dofmap]                                  # (E, d)
        q = jnp.einsum("eij,ej->ei", self.ke, ue,
                       precision=jax.lax.Precision.HIGHEST)
        return ue, q

    def apply_K(self, u, scale):
        _, q = self.apply_elements(u)
        q = q * scale[:, None]
        out = jnp.zeros(self.n_dofs, dtype=u.dtype)
        return out.at[self.dofmap].add(q)

    def apply(self, u, scale, free_mask):
        return free_mask * self.apply_K(free_mask * u, scale)

    def diagonal(self, scale, free_mask):
        ked = jnp.diagonal(self.ke, axis1=1, axis2=2)        # (E, d)
        out = jnp.zeros(self.n_dofs, dtype=scale.dtype)
        out = out.at[self.dofmap].add(scale[:, None] * ked)
        return jnp.where(free_mask > 0, out, jnp.ones_like(out))

    def block_diagonal_inverse(self, scale, free_mask):
        """Inverse 3x3 nodal diagonal blocks of the BC-masked K.

        Block Jacobi couples the three displacement components at each node —
        markedly stronger than scalar Jacobi for elasticity (the off-diagonal
        nodal coupling carries the Poisson effect).  Returns (n_nodes, 3, 3).
        """
        nn = self.ke.shape[1] // 3
        # per-element per-corner 3x3 diagonal blocks of ke
        ke_blocks = jnp.stack(
            [self.ke[:, 3 * c : 3 * c + 3, 3 * c : 3 * c + 3]
             for c in range(nn)], axis=1)                    # (E, nn, 3, 3)
        conn = self.dofmap[:, ::3] // 3                      # (E, nn) node ids
        B = jnp.zeros((self.n_nodes, 3, 3), dtype=scale.dtype)
        B = B.at[conn].add(scale[:, None, None, None] * ke_blocks)
        # BC masking: zero constrained rows/cols, identity on the diagonal
        m = free_mask.reshape(self.n_nodes, 3)
        B = B * m[:, :, None] * m[:, None, :]
        B = B + (1.0 - m)[:, :, None] * jnp.eye(3, dtype=scale.dtype)[None]
        return jnp.linalg.inv(B)

    def apply_block_jacobi(self, Binv, r):
        """M^-1 r with the inverted nodal blocks; r flat (3*n_nodes,)."""
        z = jnp.einsum("nij,nj->ni", Binv, r.reshape(self.n_nodes, 3))
        return z.reshape(-1)

    def element_energies_unit(self, u):
        ue, q = self.apply_elements(u)
        return jnp.sum(ue * q, axis=-1)

    def compliance_sensitivities(self, u, rho_phys):
        dE = self.p * rho_phys ** (self.p - 1.0) * (self.E0 - self.Emin)
        return -dE * self.element_energies_unit(u)

    # ----- variable-material (two-field Lamé) path ------------------------
    # Unstructured analogue of VoxelOperator's Lamé-basis machinery: ke_e is
    # linear in (lam, mu), so the reference's per-cell variable-material
    # re-assembly (`assemble_variable_material!`,
    # FiniteElementAnalysis.jl:719-743) becomes two batched contractions
    # against two per-element Lamé fields.  The basis batches are installed
    # by the driver only when a material_model is in use (they double the
    # element-matrix storage).
    ke_lam = None
    ke_mu = None

    def set_lame_basis(self, ke_lam, ke_mu):
        """Install per-element (ke_lam, ke_mu) batches with
        ke_e = lam_e * ke_lam_e + mu_e * ke_mu_e (see
        elements.element_stiffness_lame_basis_batch_np)."""
        self.ke_lam = jnp.asarray(ke_lam, dtype=self.dtype)
        self.ke_mu = jnp.asarray(ke_mu, dtype=self.dtype)

    def apply_K_lame(self, u, lam_field, mu_field):
        """K(lam, mu) @ u with per-element Lamé fields (E,)."""
        ue = u[self.dofmap]                                  # (E, d)
        ql = jnp.einsum("eij,ej->ei", self.ke_lam, ue,
                        precision=jax.lax.Precision.HIGHEST)
        qm = jnp.einsum("eij,ej->ei", self.ke_mu, ue,
                        precision=jax.lax.Precision.HIGHEST)
        q = lam_field[:, None] * ql + mu_field[:, None] * qm
        out = jnp.zeros(self.n_dofs, dtype=u.dtype)
        return out.at[self.dofmap].add(q)

    def apply_lame(self, u, lam_field, mu_field, free_mask):
        """BC-masked SPD action of the variable-material operator."""
        return free_mask * self.apply_K_lame(free_mask * u, lam_field,
                                             mu_field)

    def element_energies_lame(self, u):
        """(u_e^T ke_lam u_e, u_e^T ke_mu u_e) element fields — the exact
        material-derivative quadratics for variable-material sensitivities:
        dc/drho_e = -(lam'(rho) w_lam + mu'(rho) w_mu)."""
        ue = u[self.dofmap]
        wl = jnp.sum(ue * jnp.einsum("eij,ej->ei", self.ke_lam, ue,
                                     precision=jax.lax.Precision.HIGHEST),
                     axis=-1)
        wm = jnp.sum(ue * jnp.einsum("eij,ej->ei", self.ke_mu, ue,
                                     precision=jax.lax.Precision.HIGHEST),
                     axis=-1)
        return wl, wm
