"""Multilevel-AMG scaling study on synthetic unstructured tet meshes.

Evidence for the round-3 VERDICT item 5 'done' criterion: a >= 5e5-node
tet problem solved at SIMP contrast with flat-ish CG counts across mesh
sizes (the two-level design was capped near ~1e5 fine nodes by its dense
coarse solve; the recursive hierarchy removes the cap).

Each size builds the 6-tets-per-voxel synthetic mesh (the
tests/test_unstructured.py construction), a SIMP-like ~50/50 solid/void
density field at contrast E0/Emin = 1e9, a clamped x=0 plane and a
random masked load, then solves ONE preconditioned system to rtol with
the production MultilevelAMG cycle and reports level sizes + CG count.

The density field is CORRELATED (iid noise smoothed by a box filter of
--corr voxels, thresholded at its median) and SUPPORT-CONNECTED (solid
components not attached to the clamped plane are drained to void), and
the load is a structural tip load on the far end of the connected solid.
All three choices mirror what SIMP actually produces: filtered fields
form structure at the filter scale, OC drains material that carries no
strain energy, and loads sit at fixed application points on the
structure.  Violating them makes the synthetic problem a percolation
pathology instead of a SIMP solve: floating solid islands each carry ~6
rigid modes resisted only at the Emin scale (measured 5/73/398 floating
components at 16/32/48^3 for the raw thresholded field), a random
volumetric load excites those modes directly, and CG must then resolve
hundreds of 1e-9-scale eigenvalues no topology-built coarse space can
represent (measured: CG 516-1000 at 48^3 vs the connected counts below;
the reference's answer to that pathology is CHOLMOD, i.e. a direct
factorization, not a better preconditioner).  --corr 0 --no-connect
reproduces the pathological field.

Usage:
  python scripts/amg_scaling_study.py                     # CPU sweep
  python scripts/amg_scaling_study.py --sizes 80          # single 531k-node run
  python scripts/amg_scaling_study.py --tpu --dtype float32
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def correlated_density(n, corr, rng, connect=True):
    """~50/50 two-phase field with structure at the `corr`-voxel scale:
    box-smoothed iid noise thresholded at its median; with connect=True,
    solid components not touching the clamped x=0 plane are drained to
    void (what OC does to material carrying no strain energy).  Returns
    (rho_per_tet, solid_voxels (n,n,n) bool) — one voxel field repeated
    over the 6 tets of each voxel."""
    import numpy as np
    from scipy.ndimage import label, uniform_filter

    w = rng.uniform(size=(n, n, n))
    if corr > 0:
        w = uniform_filter(w, size=2 * corr + 1, mode="nearest")
    solid = w > np.median(w)
    if connect:
        lab, _ = label(solid)
        keep = np.unique(lab[0, :, :])
        solid &= np.isin(lab, keep[keep > 0])
    # tet_mesh_from_voxels concatenates BLOCKS of per-hex tets (all tet-0s,
    # then all tet-1s, ...), and hex cell ids are x-fastest: tile, don't
    # repeat, and flatten [ix,iy,iz] x-fastest
    rho_vox = np.where(solid, 1.0, 1e-3).transpose(2, 1, 0).reshape(-1)
    return np.tile(rho_vox, 6), solid


def run_size(n, dtype, rtol, contrast, max_coarse, corr, connect=True,
             smoothed=False):
    import jax.numpy as jnp
    import numpy as np

    import easysimp_tpu as et
    from easysimp_tpu.ops.amg import MultilevelAMG
    from easysimp_tpu.ops.cg import cg_solve
    from easysimp_tpu.ops.elements import element_stiffness_batch_np
    from easysimp_tpu.ops.operator import UnstructuredOperator
    from test_unstructured import tet_mesh_from_voxels

    jdt = jnp.dtype(dtype)
    t0 = time.time()
    mesh = tet_mesh_from_voxels((n, n, n))
    ke, _ = element_stiffness_batch_np(
        mesh.node_coords[mesh.connectivity], E=1.0, nu=0.3)
    op = UnstructuredOperator(ke.astype(dtype), mesh.connectivity,
                              mesh.n_nodes, E0=1.0, Emin=1.0 / contrast,
                              nu=0.3, p=3.0, dtype=jdt)
    bc = et.apply_fixed_boundary(
        mesh, et.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6))
    mask = jnp.asarray(et.build_free_mask(mesh, [bc]), dtype=jdt)
    rng = np.random.default_rng(0)
    rho_np, solid = correlated_density(n, corr, rng, connect=connect)
    rho = jnp.asarray(rho_np, dtype=jdt)
    assert rho.shape[0] == mesh.n_cells
    scale = op.youngs_modulus(rho)
    # structural tip load: [0,-1,0] on the solid nodes with the largest x
    # (top percentile), like a cantilever tip — never on void or islands
    solid_cells = np.nonzero(rho_np > 0.5)[0]
    solid_nodes = np.unique(np.asarray(mesh.connectivity)[solid_cells])
    x = mesh.node_coords[solid_nodes, 0]
    tip = solid_nodes[x >= np.quantile(x, 0.99)]
    f_np = np.zeros(mesh.n_dofs)
    f_np[3 * tip + 1] = -1.0
    f = jnp.asarray(f_np, dtype=jdt) * mask
    t_build = time.time() - t0

    t0 = time.time()
    amg = MultilevelAMG(op, mesh, np.asarray(mask),
                        max_coarse_dofs=max_coarse,
                        smooth_prolongator=smoothed)
    t_hier = time.time() - t0

    A = lambda v: op.apply(v, scale, mask)
    Binv = op.block_diagonal_inverse(scale, mask)
    t0 = time.time()
    state = amg.setup(scale, mask, Binv, A)
    import jax

    jax.block_until_ready(state["L"])
    t_setup = time.time() - t0
    t0 = time.time()
    sol = cg_solve(A, f, x0=jnp.zeros_like(f),
                   M=lambda r: amg.apply(r, A, Binv, state, mask),
                   rtol=rtol, maxiter=1000)
    jax.block_until_ready(sol.u)
    t_solve = time.time() - t0
    return {
        "nels": n, "n_nodes": mesh.n_nodes, "n_dofs": mesh.n_dofs,
        "n_elements": mesh.n_cells,
        "level_sizes_dofs": [mesh.n_dofs] + [6 * s for s in amg.sizes],
        "n_levels": 1 + amg.n_coarse_levels,
        "coarsest_dofs": amg.nc,
        "cg_iterations": int(sol.iterations),
        "residual": float(sol.residual_norm),
        "build_s": round(t_build, 1), "hierarchy_s": round(t_hier, 1),
        "setup_s": round(t_setup, 1), "solve_s": round(t_solve, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,32,48,64,80",
                    help="comma list of voxel cube sizes; 80 -> 531k nodes")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--rtol", type=float, default=1e-8)
    ap.add_argument("--contrast", type=float, default=1e9)
    ap.add_argument("--max-coarse-dofs", type=int, default=6000)
    ap.add_argument("--corr", type=int, default=3,
                    help="density correlation half-width in voxels "
                         "(0 = iid percolation pathology)")
    ap.add_argument("--no-connect", action="store_true",
                    help="keep floating solid islands (pathological)")
    ap.add_argument("--smoothed", action="store_true",
                    help="smoothed-aggregation prolongators "
                         "(P_s = (I - 4/3 B^-1 A) P_t)")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tpu:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    else:
        jax.config.update("jax_platforms", "cpu")
        if args.dtype == "float64":
            jax.config.update("jax_enable_x64", True)

    results = []
    for tok in args.sizes.split(","):
        n = int(tok)
        print(f"--- {n}^3 voxels -> {(n + 1) ** 3} nodes ---",
              file=sys.stderr)
        r = run_size(n, args.dtype, args.rtol, args.contrast,
                     args.max_coarse_dofs, args.corr,
                     connect=not args.no_connect, smoothed=args.smoothed)
        print(f"  levels {r['level_sizes_dofs']}  cg {r['cg_iterations']}  "
              f"hier {r['hierarchy_s']}s setup {r['setup_s']}s "
              f"solve {r['solve_s']}s", file=sys.stderr)
        results.append(r)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
