"""Multilevel aggregation AMG for the unstructured (imported-mesh) path.

Replaces plain (block-)Jacobi CG as the unstructured preconditioner — the
last place where the reference's CHOLMOD direct solve
(src/Optimization/Optimization.jl:317) beat the matrix-free rebuild on CG
iteration counts at SIMP contrast (E_max/E_min ~ 1e9).

TPU-first split, mirroring the voxel multigrid (ops/multigrid.py):

  * HOST, once per problem: recursively aggregate the node graph (greedy
    root-node clustering), build the smoothed-aggregation-style tentative
    prolongators from the rigid-body near-nullspace (level 0: per-node
    (3, 6) blocks, BC-masked, SVD-orthonormalized per aggregate; deeper
    levels: per-aggregate SVD of the coarse near-nullspace carried down
    the hierarchy, Vanek/Mandel/Brezina-style), and precompute the
    block-pair index structure of every Galerkin level.
  * DEVICE, once per SIMP iteration (densities change): assemble the
    level-1 block-sparse operator A_1[pair] = sum_e E(rho_e) P_a^T ke_e
    P_b with batched einsums + one scatter-add (chunked over elements so
    the transient stays bounded on multi-million-element meshes), Galerkin
    the deeper levels through the precomputed pair maps, invert the
    l1-regularized 6x6/3x3 smoother blocks per level, and Cholesky-factor
    the (dense, small) coarsest level.
  * DEVICE, per CG iteration: symmetric multilevel V-cycle with
    Chebyshev l1-block-Jacobi smoothing on the FIXED interval [1/6, 1]
    (lam_max(B^-1 A) <= 1 exactly by the l1 construction — no spectral
    estimation; SPD by construction, safe inside CG.  Single damped-
    Jacobi sweeps measured size-degrading CG growth — 95/106/516 at
    16/32/48^3 random-contrast — the classic unsmoothed-aggregation
    weakness, and estimated Chebyshev bounds either under-read lam_max
    at SIMP contrast, diverging, or over-read it 2.5x, wasting CG).

Unlike the earlier two-level design, the coarse hierarchy recurses until
the coarsest level fits a dense factorization (`max_coarse_dofs`), so
imported meshes are no longer capped near ~1e5 fine nodes; and the
per-element coarse Galerkin blocks are computed on device per iteration
instead of being precomputed ((E, nn, nn, 6, 6) host tensors grew to
hundreds of MB on the reference's gripper alone).

`smooth_prolongator=True` upgrades the tentative transfers to smoothed
aggregation (Vanek/Mandel/Brezina): P_s = (I - omega B^-1 A) P_t with
the l1 blocks as B and omega = 4/3 / lam_max(B^-1 A) power-estimated
per level.  Because A carries the densities, P_s is rebuilt ON DEVICE
each SIMP iteration: the fine operator is assembled once per iteration
in node-node block-sparse form and the Galerkin triple products run
over host-precomputed flat term indices (see _sa_structure) — a
lax.scan keeps the compiled program constant-size in the term count.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

__all__ = ["greedy_aggregate", "rigid_body_prolongator", "MultilevelAMG"]


def _node_adjacency(connectivity, n_nodes):
    """Symmetric node-node adjacency (CSR) from element connectivity."""
    conn = np.asarray(connectivity)
    nn = conn.shape[1]
    rows, cols = [], []
    for a in range(nn):
        for b in range(nn):
            if a != b:
                rows.append(conn[:, a])
                cols.append(conn[:, b])
    data = np.ones(len(rows) * conn.shape[0], dtype=np.int8)
    A = sp.coo_matrix(
        (data, (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_nodes, n_nodes)).tocsr()
    A.sum_duplicates()
    return A


def _greedy_csr(indptr, indices, n, max_agg=0):
    """Greedy root-node aggregation on a CSR graph (see greedy_aggregate).
    max_agg > 0 caps the aggregate size (absorb at most max_agg - 1
    neighbors per seed; attach passes respect the cap best-effort)."""
    agg = np.full(n, -1, dtype=np.int64)
    count = []
    n_agg = 0
    for v in range(n):
        if agg[v] != -1:
            continue
        nbrs = indices[indptr[v]:indptr[v + 1]]
        if np.all(agg[nbrs] == -1):
            if max_agg > 0 and nbrs.size > max_agg - 1:
                nbrs = nbrs[:max_agg - 1]
            agg[v] = n_agg
            agg[nbrs] = n_agg
            count.append(1 + nbrs.size)
            n_agg += 1
    for v in range(n):
        if agg[v] != -1:
            continue
        nbrs = indices[indptr[v]:indptr[v + 1]]
        owners = agg[nbrs]
        owners = owners[owners >= 0]
        if owners.size:
            counts = np.bincount(owners)
            if max_agg > 0:
                open_ = [o for o in np.argsort(counts)[::-1] if counts[o]
                         and count[o] < max_agg]
                if open_:
                    a = int(open_[0])
                    agg[v] = a
                    count[a] += 1
                    continue
            agg[v] = counts.argmax()
            count[agg[v]] += 1
        else:
            agg[v] = n_agg
            count.append(1)
            n_agg += 1
    return agg.astype(np.int32), n_agg


def greedy_aggregate(connectivity, n_nodes, max_agg=0):
    """Root-node aggregation of the mesh node graph.

    Pass 1 seeds aggregates at nodes whose whole neighborhood is free and
    absorbs the neighborhood; pass 2 attaches remaining nodes to the
    aggregate most common among their neighbors; pass 3 makes singleton
    aggregates of anything isolated.  Returns (agg_index (n_nodes,) int32,
    n_aggregates).
    """
    A = _node_adjacency(connectivity, n_nodes)
    return _greedy_csr(A.indptr, A.indices, n_nodes, max_agg=max_agg)


def rigid_body_prolongator(coords, agg, n_agg, free_mask,
                           return_coarse=False):
    """Per-node (3, 6) prolongator blocks spanning the BC-masked rigid body
    modes of each aggregate.

    Columns are the aggregate's 6 RBMs (3 translations + 3 rotations about
    its centroid), rows masked by the Dirichlet mask BEFORE the per-
    aggregate SVD orthonormalization, so constrained dofs drop out of the
    coarse basis instead of wasting columns.  Rank-deficient aggregates
    (few free dofs) get zero columns; the coarse assembly regularizes the
    matching diagonal entries.

    return_coarse=True additionally returns the coarse near-nullspace
    B1 (n_agg, 6, 6) with B0|agg = Q @ B1[agg] (the S V^T factor of each
    per-aggregate SVD) — the seed for recursive aggregation.
    """
    coords = np.asarray(coords, dtype=np.float64)
    n_nodes = coords.shape[0]
    mask = np.asarray(free_mask, dtype=np.float64).reshape(n_nodes, 3)
    P = np.zeros((n_nodes, 3, 6))
    Bc = np.zeros((n_agg, 6, 6))
    order = np.argsort(agg, kind="stable")
    bounds = np.searchsorted(agg[order], np.arange(n_agg + 1))
    for a in range(n_agg):
        nodes = order[bounds[a]:bounds[a + 1]]
        if nodes.size == 0:
            continue
        x = coords[nodes] - coords[nodes].mean(axis=0)
        m = nodes.size
        B = np.zeros((m, 3, 6))
        B[:, :, :3] = np.eye(3)
        # rotations: r = omega x (x - centroid)
        B[:, 0, 4], B[:, 0, 5] = x[:, 2], -x[:, 1]
        B[:, 1, 3], B[:, 1, 5] = -x[:, 2], x[:, 0]
        B[:, 2, 3], B[:, 2, 4] = x[:, 1], -x[:, 0]
        B *= mask[nodes][:, :, None]
        U, s, Vt = np.linalg.svd(B.reshape(3 * m, 6), full_matrices=False)
        r = int((s > max(1e-10, 1e-8 * (s[0] if s.size else 0.0))).sum())
        P[nodes, :, :r] = U[:, :r].reshape(m, 3, r)
        Bc[a, :r, :] = s[:r, None] * Vt[:r]
    # SVD leaves O(eps) residue in masked rows — re-mask so constrained
    # dofs are EXACTLY outside the coarse space.
    P *= mask[:, :, None]
    if return_coarse:
        return P, Bc
    return P


def _tentative_from_basis(B, agg, n_agg):
    """Tentative prolongator for a coarse level from its near-nullspace.

    B: (n, k, 6) per-node basis rows (k dofs per node).  Per aggregate the
    stacked member rows (m*k, 6) are SVD-orthonormalized: P holds the Q
    factor as per-node (k, 6) blocks (zero columns beyond the rank), and
    the next-level basis is the S V^T factor, so B|agg = Q @ B_next[agg].
    """
    B = np.asarray(B, dtype=np.float64)
    n, k, _ = B.shape
    P = np.zeros((n, k, 6))
    Bc = np.zeros((n_agg, 6, 6))
    order = np.argsort(agg, kind="stable")
    bounds = np.searchsorted(agg[order], np.arange(n_agg + 1))
    for a in range(n_agg):
        nodes = order[bounds[a]:bounds[a + 1]]
        if nodes.size == 0:
            continue
        m = nodes.size
        M = B[nodes].reshape(m * k, 6)
        U, s, Vt = np.linalg.svd(M, full_matrices=False)
        r = int((s > max(1e-10, 1e-8 * (s[0] if s.size else 0.0))).sum())
        P[nodes, :, :r] = U[:, :r].reshape(m, k, r)
        Bc[a, :r, :] = s[:r, None] * Vt[:r]
    return P, Bc


def _highest_precision(fn):
    """Trace the wrapped body under HIGHEST matmul precision.

    fp32-on-TPU requirement (same class as the voxel path's explicit
    precision=HIGHEST pins, CLAUDE.md): the MXU's default bf16 multiplies
    lose the SPD-ness of the AMG's Galerkin assembly chain at elasticity
    conditioning — the gripper workload NaN'd its coarsest Cholesky on the
    FIRST step (uniform design) on TPU while the bit-identical CPU run is
    finite.  The affected einsums are batched small-block contractions, so
    the multi-pass emulation cost is noise next to the scatter-adds."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped


def _unique_pairs(rows, cols, n):
    """Sorted unique (row, col) pair list + inverse index for scatter-adds."""
    key = rows.astype(np.int64) * n + cols.astype(np.int64)
    upairs, inv = np.unique(key, return_inverse=True)
    return ((upairs // n).astype(np.int32), (upairs % n).astype(np.int32),
            inv.astype(np.int32))


def _sa_structure(p_rows, p_cols, agg, n_agg, n_fine):
    """Index structure for one smoothed-prolongator transfer (host, once).

    Given a level's operator pair pattern (p_rows, p_cols) and its
    aggregation map, the smoothed prolongator P_s = (I - w B^-1 A) P_t
    lives on the (fine row, aggregate) pattern

        {(r, agg[c]) for pairs} U {(v, agg[v]) for fine rows v}

    and the next-level Galerkin operator A' = P_s^T A P_s on the pattern
    {(a, b) : a in aggs(row m), b in aggs(row n), (m, n) a pair}.  Returns

      na_rows, na_cols       the P_s pattern (sorted row-major)
      pair2na                pair id -> na id of (p_rows, agg[p_cols])
                             (scatter target for Y = A P_t)
      inject                 fine row v -> na id of (v, agg[v])
                             (scatter target for the P_t term of P_s)
      t_pid, t_left, t_right, t_out
                             flat term arrays of the triple product
                             A'[t_out] += P_s[t_left]^T A[t_pid] P_s[t_right]
      q_rows, q_cols         the A' pattern
    """
    p_rows = np.asarray(p_rows)
    p_cols = np.asarray(p_cols)
    agg = np.asarray(agg, dtype=np.int64)
    key = p_rows.astype(np.int64) * n_agg + agg[p_cols]
    keyv = np.arange(n_fine, dtype=np.int64) * n_agg + agg[:n_fine]
    ukeys, inv = np.unique(np.concatenate([key, keyv]), return_inverse=True)
    na_rows = (ukeys // n_agg).astype(np.int32)
    na_cols = (ukeys % n_agg).astype(np.int32)
    pair2na = inv[:key.size].astype(np.int32)
    inject = inv[key.size:].astype(np.int32)
    # CSR of the (sorted) na entries by fine row
    start = np.searchsorted(na_rows, np.arange(n_fine + 1)).astype(np.int64)
    deg = start[1:] - start[:-1]
    dL, dR = deg[p_rows], deg[p_cols]
    tcount = dL * dR
    total = int(tcount.sum())
    # The triple-product term list is the K^2 DATA footprint of smoothed
    # aggregation (the program size stays constant, the index arrays do
    # not): several int64 host arrays + 4 int32 device arrays of length
    # `total`, which on a fine imported mesh reaches hundreds of terms per
    # node.  Guard before materializing anything so an oversized mesh
    # fails with a budget message instead of a host/HBM OOM mid-sort.
    budget = int(os.environ.get("EASYSIMP_SA_TERM_BUDGET", 300_000_000))
    if total > budget:
        raise ValueError(
            f"smoothed-prolongator term list needs {total:,} triple-product "
            f"entries (> budget {budget:,}; ~{total * 40 / 1e9:.1f} GB host "
            f"during construction). Use amg_smooth_prolongator=False for "
            f"this mesh, or raise EASYSIMP_SA_TERM_BUDGET if the host can "
            f"take it.")
    t_pid = np.repeat(np.arange(p_rows.size, dtype=np.int64), tcount)
    offs = np.concatenate([[0], np.cumsum(tcount)[:-1]])
    k = np.arange(total, dtype=np.int64) - offs[t_pid]
    t_left = start[p_rows][t_pid] + k // dR[t_pid]
    t_right = start[p_cols][t_pid] + k % dR[t_pid]
    okey = na_cols[t_left].astype(np.int64) * n_agg + na_cols[t_right]
    uo, t_out = np.unique(okey, return_inverse=True)
    q_rows = (uo // n_agg).astype(np.int32)
    q_cols = (uo % n_agg).astype(np.int32)
    terms = (t_pid.astype(np.int32), t_left.astype(np.int32),
             t_right.astype(np.int32), t_out.astype(np.int32))
    return na_rows, na_cols, pair2na, inject, terms, q_rows, q_cols


class MultilevelAMG:
    """Recursive RBM-aggregation preconditioner for UnstructuredOperator.

    Host-side constants are built in __init__; `setup(scale, free_mask,
    Binv, A)` runs once per SIMP iteration (returns the per-level operator
    blocks, smoother data, and the coarsest Cholesky factor), `apply(...)`
    is the per-CG-iteration V-cycle.

    max_coarse_dofs bounds the dense coarsest factorization; the hierarchy
    recurses until the coarse dimension fits (or coarsening stalls).
    """

    # transient budget for the chunked level-1 assembly (bytes)
    _CHUNK_BYTES = 96 * 1024 * 1024

    # static scan-chunk length for the smoothed-prolongator triple product
    _SA_TERM_CHUNK = 1 << 18

    def __init__(self, op, mesh, free_mask, power_iters=8,
                 max_coarse_dofs=6000, max_levels=10, smooth_iters=(3, 3),
                 max_agg_nodes=0, smooth_prolongator=False):
        # smooth_iters default: (1,1)/(2,2)/(3,3)/(2,4) measured CG
        # 158/118/99/118 at equal wall on the 24^3 connected two-phase
        # study (scripts/amg_scaling_study.py)
        self.op = op
        self.power_iters = int(power_iters)   # retained for API compat;
        # the Chebyshev bounds use Gershgorin (see _level_lam_bound)
        if isinstance(smooth_iters, int):
            smooth_iters = (smooth_iters, smooth_iters)
        # Chebyshev degrees: [0] at the fine level, [1] on coarse levels
        self.smooth_iters = tuple(int(s) for s in smooth_iters)
        conn = np.asarray(mesh.connectivity)
        n_nodes = mesh.n_nodes
        E, nn = conn.shape
        self.nn = nn

        # ---- level 0 -> 1: RBM tentative prolongator --------------------
        agg0, n1 = greedy_aggregate(conn, n_nodes, max_agg=max_agg_nodes)
        Pn, B = rigid_body_prolongator(mesh.node_coords, agg0, n1,
                                       free_mask, return_coarse=True)
        self.Pn = jnp.asarray(Pn, dtype=op.dtype)         # (n, 3, 6)
        self.agg_idx = jnp.asarray(agg0)                  # (n,)
        self.n_nodes = n_nodes
        self.node_conn = jnp.asarray(conn.astype(np.int32))

        self.smooth_p = bool(smooth_prolongator)
        self._sa_na = []        # per-transfer (na_rows, na_cols)
        self._sa_pair2na = []   # per-transfer pair id -> na id
        self._sa_inject = []    # per-transfer fine row -> na id of (v, agg[v])
        self._sa_terms = []     # per-transfer padded (C, chunk) term arrays
        if self.smooth_p:
            # node-node pair pattern (self-pairs forced so the P_t
            # injection slot (v, agg[v]) always exists)
            rn = np.broadcast_to(conn[:, :, None], (E, nn, nn)).ravel()
            cn = np.broadcast_to(conn[:, None, :], (E, nn, nn)).ravel()
            arange_n = np.arange(n_nodes)
            n_rows, n_cols, inv_nn = _unique_pairs(
                np.concatenate([rn, arange_n]),
                np.concatenate([cn, arange_n]), n_nodes)
            self.elem_nodepair_idx = jnp.asarray(
                inv_nn[:E * nn * nn].reshape(E, nn, nn))
            self.nodepair_rows = jnp.asarray(n_rows)
            self.nodepair_cols = jnp.asarray(n_cols)
            self.elem_pair_idx = None
            p_rows, p_cols = self._push_sa_level(n_rows, n_cols, agg0, n1,
                                                 n_nodes)
            # aggregation GRAPH for the deeper levels: the tentative
            # (distance-1) aggregate adjacency, NOT the smoothed operator
            # pattern — greedy aggregation on the dist-3 smoothed pattern
            # absorbs whole neighborhoods and over-coarsens catastrophically
            # (measured 112 -> 2 aggregates in one step on a 20x10x10 tet
            # mesh vs 112 -> 12 on the tentative graph)
            ea = agg0[conn]
            t_rows, t_cols, _ = _unique_pairs(
                np.broadcast_to(ea[:, :, None], (E, nn, nn)).ravel(),
                np.broadcast_to(ea[:, None, :], (E, nn, nn)).ravel(), n1)
        else:
            # level-1 block-pair structure from the element connectivity
            ea = agg0[conn]                               # (E, nn)
            rows = np.broadcast_to(ea[:, :, None], (E, nn, nn)).ravel()
            cols = np.broadcast_to(ea[:, None, :], (E, nn, nn)).ravel()
            p_rows, p_cols, inv = _unique_pairs(rows, cols, n1)
            self.elem_pair_idx = jnp.asarray(inv.reshape(E, nn, nn))

        # chunk slices so the (c, nn, nn, 6, 6) assembly transient stays
        # bounded on multi-million-element meshes
        itemsize = jnp.dtype(op.dtype).itemsize
        per_elem = (nn * 3 * nn * 6 + nn * nn * 36) * itemsize
        chunk = max(1, self._CHUNK_BYTES // per_elem)
        self.chunk_slices = [(s, min(s + chunk, E))
                             for s in range(0, E, chunk)]

        # l1 block-Jacobi smoother constants (Baker-Falgout-Kolev-Yang):
        # signed 3x3 corner blocks of ke and the per-dof OFF-block |ke| row
        # sums.  B_I = A_II + diag(sum_{j not in I} |A_ij|) majorizes A
        # (2|a|xy <= |a|(x^2+y^2) entrywise), so lam_max(B^-1 A) <= 1
        # EXACTLY — the Chebyshev interval needs no spectral estimation.
        ke_r = np.asarray(op.ke).reshape(E, nn, 3, nn, 3)
        corner = np.stack([ke_r[:, a, :, a, :] for a in range(nn)], axis=1)
        absrow = np.abs(ke_r).sum(axis=(3, 4))
        within = np.abs(corner).sum(axis=3)
        self.ke_corner = jnp.asarray(corner, dtype=op.dtype)
        self.ke_l1off = jnp.asarray(absrow - within, dtype=op.dtype)


        # ---- deeper levels: recurse on the aggregate graph --------------
        self.sizes = [n1]                  # nodes per coarse level
        self.pair_rows = [jnp.asarray(p_rows)]
        self.pair_cols = [jnp.asarray(p_cols)]
        self.P_coarse = []                 # per-level (n_l, 6, 6) blocks
        self.agg_coarse = []               # per-level aggregation maps
        self.pair_maps = []                # pair index l -> l+1
        self.diag_idx = []                 # positions of (i, i) pairs
        np_rows, np_cols = p_rows, p_cols
        while 6 * self.sizes[-1] > max_coarse_dofs and \
                len(self.sizes) < max_levels:
            n_l = self.sizes[-1]
            g_rows, g_cols = (t_rows, t_cols) if self.smooth_p \
                else (np_rows, np_cols)
            off = g_rows != g_cols
            A = sp.coo_matrix(
                (np.ones(off.sum(), dtype=np.int8),
                 (g_rows[off], g_cols[off])), shape=(n_l, n_l)).tocsr()
            A.sum_duplicates()
            agg_l, n_next = _greedy_csr(A.indptr, A.indices, n_l,
                                        max_agg=max_agg_nodes)
            if n_next >= n_l:              # coarsening stalled
                break
            P_l, B = _tentative_from_basis(B, agg_l, n_next)
            if self.smooth_p:
                q_rows, q_cols = self._push_sa_level(np_rows, np_cols,
                                                     agg_l, n_next, n_l)
                t_rows, t_cols, _ = _unique_pairs(
                    agg_l[t_rows], agg_l[t_cols], n_next)
            else:
                rows_next = agg_l[np_rows]
                cols_next = agg_l[np_cols]
                q_rows, q_cols, pair_map = _unique_pairs(
                    rows_next, cols_next, n_next)
                self.pair_maps.append(jnp.asarray(pair_map))
            self.P_coarse.append(jnp.asarray(P_l, dtype=op.dtype))
            self.agg_coarse.append(jnp.asarray(agg_l))
            self.sizes.append(n_next)
            self.pair_rows.append(jnp.asarray(q_rows))
            self.pair_cols.append(jnp.asarray(q_cols))
            np_rows, np_cols = q_rows, q_cols
        for l, (r, c) in enumerate(zip(self.pair_rows, self.pair_cols)):
            r, c = np.asarray(r), np.asarray(c)
            d = np.nonzero(r == c)[0]
            # nodes without a self-pair (isolated in the graph) map to
            # slot 0 and get identity blocks in _block_inv
            pos = np.zeros(self.sizes[l], dtype=np.int32)
            has = np.zeros(self.sizes[l], dtype=bool)
            pos[r[d]] = d
            has[r[d]] = True
            self.diag_idx.append((jnp.asarray(pos), jnp.asarray(has)))
        self.n_coarse_levels = len(self.sizes)
        self.nc = 6 * self.sizes[-1]       # coarsest (dense) dimension

    def _push_sa_level(self, p_rows, p_cols, agg, n_agg, n_fine):
        """Build + store the smoothed-transfer index structure for one
        level (host, once); returns the next level's operator pattern."""
        (na_r, na_c, pair2na, inject, terms,
         q_rows, q_cols) = _sa_structure(p_rows, p_cols, agg, n_agg, n_fine)
        self._sa_na.append((jnp.asarray(na_r), jnp.asarray(na_c)))
        self._sa_pair2na.append(jnp.asarray(pair2na))
        self._sa_inject.append(jnp.asarray(inject))
        # pad the term arrays to a scan-chunk multiple; padded entries
        # scatter into a dummy row n_out that _sa_galerkin drops
        t_pid, t_left, t_right, t_out = terms
        total = t_pid.size
        chunk = max(1, min(total, self._SA_TERM_CHUNK))
        n_chunks = -(-total // chunk)
        pad = n_chunks * chunk - total

        def _padded(a, fill):
            return jnp.asarray(np.concatenate(
                [a, np.full(pad, fill, dtype=a.dtype)]).reshape(
                    n_chunks, chunk))

        self._sa_terms.append((_padded(t_pid, 0), _padded(t_left, 0),
                               _padded(t_right, 0),
                               _padded(t_out, q_rows.size)))
        return q_rows, q_cols

    # ----- level-0 transfer operators (device) -----------------------------
    def restrict(self, r):
        """P^T r: (3n,) -> level-1 (n1 * 6,)."""
        rn = r.reshape(self.n_nodes, 3)
        contrib = jnp.einsum("nik,ni->nk", self.Pn, rn)   # (n, 6)
        rc = jnp.zeros((self.sizes[0], 6), dtype=r.dtype)
        return rc.at[self.agg_idx].add(contrib).reshape(-1)

    def prolong(self, zc):
        """P zc: level-1 (n1 * 6,) -> (3n,)."""
        za = zc.reshape(self.sizes[0], 6)[self.agg_idx]   # (n, 6)
        return jnp.einsum("nik,nk->ni", self.Pn, za).reshape(-1)

    # ----- per-SIMP-iteration setup (device, jit-safe) ---------------------
    def _assemble_level1(self, scale):
        """A_1 block-sparse: (n_pairs1, 6, 6) = sum_e E_e P_a^T ke_e P_b,
        chunked over elements (static slices, unrolled in the program)."""
        ke = self.op.ke
        nn = self.nn
        acc = jnp.zeros((self.pair_rows[0].shape[0], 6, 6),
                        dtype=self.Pn.dtype)
        for s, e in self.chunk_slices:
            c = e - s
            pe = self.Pn[self.node_conn[s:e]]             # (c, nn, 3, 6)
            w = scale[s:e].astype(self.Pn.dtype)
            # weight FIRST: ke and Pn are trace-time constants, so a
            # scale-independent half-transform would get constant-folded
            # by XLA into a Ge-sized tensor at every compile
            keb = (ke[s:e] * w[:, None, None]).reshape(c, nn, 3, nn, 3)
            half = jnp.einsum("eacbd,ebdj->eacbj", keb, pe)
            g = jnp.einsum("eaci,eacbj->eabij", pe, half)
            acc = acc.at[self.elem_pair_idx[s:e].reshape(-1)].add(
                g.reshape(-1, 6, 6))
        return acc

    def _galerkin_next(self, l, blocks):
        """A_{l+1} blocks from A_l blocks through the tentative P_l."""
        P = self.P_coarse[l]
        rows, cols = self.pair_rows[l], self.pair_cols[l]
        half = jnp.einsum("pkl,plj->pkj", blocks, P[cols])
        g = jnp.einsum("pki,pkj->pij", P[rows], half)
        out = jnp.zeros((self.pair_rows[l + 1].shape[0], 6, 6),
                        dtype=blocks.dtype)
        return out.at[self.pair_maps[l]].add(g)

    # ----- smoothed-aggregation setup pieces (device, jit-safe) ------------
    #
    # The tentative (unsmoothed) transfers give piecewise-RBM coarse
    # spaces whose energy error grows with aggregate diameter — the
    # classic size-degrading convergence of plain aggregation AMG
    # (measured here: CG 78 @24^3 -> 228 @32^3 on the connected two-phase
    # study at 1e9 contrast).  One damped-Jacobi smoothing step
    #
    #     P_s = (I - (4/3) B^-1 A) P_t
    #
    # (Vanek/Mandel/Brezina) restores near-optimal approximation.  B is
    # the l1 smoother block diagonal already built per level; its exact
    # bound lam_max(B^-1 A) <= 1 is ~2.5x LOOSE for elasticity (sign
    # cancellations in the off-block row sums), which leaves omega = 4/3
    # under-damped — so omega = 4/3 / lam uses a POWER-ITERATION estimate
    # of lam_max(B^-1 A) per level (_sa_lambda below; safe because any
    # P_s yields an SPSD A', estimate error only degrades transfer
    # quality gracefully).  Scaling measurements for both omega choices:
    # docs/performance_tuning.md "Unstructured AMG" section.
    # Because A changes with the densities, P_s is rebuilt on device each
    # SIMP iteration: the fine operator is assembled once in node-node
    # block-sparse form, Y = A P_t rides a precomputed pair -> (row, agg)
    # map, and the Galerkin product P_s^T A P_s runs as a lax.scan over
    # precomputed flat term indices (_sa_structure) — no element-wise
    # K^2 blowup, and the program size stays constant in mesh size.

    def _assemble_node_blocks(self, scale, free_mask):
        """Masked fine operator in node-node block-sparse form:
        (n_nodepairs, 3, 3), chunk-assembled from the element ke."""
        sc = scale.astype(self.Pn.dtype)
        ke = self.op.ke
        nn = self.nn
        acc = jnp.zeros((self.nodepair_rows.shape[0], 3, 3),
                        dtype=self.Pn.dtype)
        for s, e in self.chunk_slices:
            c = e - s
            keb = (ke[s:e] * sc[s:e, None, None]).reshape(c, nn, 3, nn, 3)
            g = jnp.transpose(keb, (0, 1, 3, 2, 4))      # (c, nn, nn, 3, 3)
            acc = acc.at[self.elem_nodepair_idx[s:e].reshape(-1)].add(
                g.reshape(-1, 3, 3))
        m = free_mask.reshape(self.n_nodes, 3).astype(acc.dtype)
        return (acc * m[self.nodepair_rows][:, :, None]
                * m[self.nodepair_cols][:, None, :])

    # Power iterations for the prolongator damping omega = 4/3 / lam.
    # Unlike the Chebyshev interval (where an under-read DIVERGES — see
    # the l1 rationale above), the damping only shapes P_s: A' = P_s^T A
    # P_s is SPSD for ANY P_s, so estimate error degrades transfer
    # quality gracefully.  The exact l1 bound lam <= 1 is ~2.5x loose for
    # elasticity (sign cancellations), which left omega = 4/3
    # under-damped: measured CG 61/61/167 at 16/24/32^3 connected
    # two-phase 1e9-contrast with the fixed bound vs the estimated-omega
    # counts in docs/performance_tuning.md.
    _SA_POWER_ITERS = 10

    def _sa_lambda(self, Aapply, Bapply, n_fine, k, dtype):
        """Power-iteration estimate of lam_max(B^-1 A) at one level,
        integer-Knuth-hash start (no sin of large args on TPU)."""
        h = (jnp.arange(n_fine * k, dtype=jnp.uint32)
             * jnp.uint32(2654435761))
        v = ((h >> 8).astype(dtype) / jnp.asarray(2.0**24, dtype)
             - 0.5).reshape(n_fine, k)
        tiny = jnp.finfo(dtype).tiny
        lam = jnp.asarray(1.0, dtype)
        for _ in range(self._SA_POWER_ITERS):
            w = Bapply(Aapply(v))
            lam = jnp.sqrt(jnp.vdot(w, w)
                           / jnp.maximum(jnp.vdot(v, v), tiny))
            v = w / jnp.maximum(jnp.sqrt(jnp.vdot(w, w)), tiny)
        return jnp.clip(lam, 0.05, 1.0)

    def _node_matvec(self, Anode, v):
        """Masked fine matvec through the node-node blocks; v (n, 3)."""
        contrib = jnp.einsum("pab,pb->pa", Anode, v[self.nodepair_cols])
        return jnp.zeros_like(v).at[self.nodepair_rows].add(contrib)

    def _smooth_transfer(self, l, blocks, cols, Binv, Pt, omega):
        """P_s = P_t - omega B^-1 (A P_t) on the precomputed na pattern.
        blocks: (n_pairs, k, k) A blocks, cols their column ids, Binv the
        l1 block inverses (n_fine, k, k), Pt (n_fine, k, 6)."""
        na_r, _ = self._sa_na[l]
        y = jnp.einsum("pab,pbj->paj", blocks, Pt[cols])
        Y = jnp.zeros((na_r.shape[0],) + Pt.shape[1:], dtype=Pt.dtype)
        Y = Y.at[self._sa_pair2na[l]].add(y)
        Z = jnp.zeros_like(Y).at[self._sa_inject[l]].set(Pt)
        return Z - omega * jnp.einsum("nab,nbj->naj", Binv[na_r], Y)

    def _sa_galerkin(self, l, Amid, Ps):
        """A_next = P_s^T A P_s over the flat term index, as a scan so the
        compiled program is constant-size in the term count."""
        n_out = int(self.pair_rows[l].shape[0])
        acc0 = jnp.zeros((n_out + 1, 6, 6), dtype=Amid.dtype)

        def body(acc, idx):
            pid, lft, rgt, out = idx
            g = jnp.einsum("tki,tkl,tlj->tij", Ps[lft], Amid[pid], Ps[rgt])
            return acc.at[out].add(g), None

        acc, _ = jax.lax.scan(body, acc0, self._sa_terms[l])
        return acc[:-1]

    def _matvec_level(self, l, blocks, v):
        """Block-sparse A_l v; v (n_l, 6)."""
        contrib = jnp.einsum("pij,pj->pi", blocks,
                             v[self.pair_cols[l]])
        return jnp.zeros_like(v).at[self.pair_rows[l]].add(contrib)

    # Chebyshev smoothing intervals.
    #
    # An UPPER bound on lam_max(B^-1 A) is mandatory: Chebyshev (and
    # damped Jacobi) AMPLIFY the spectrum above their interval, and a
    # power-iteration Rayleigh quotient is a LOWER bound — at SIMP
    # contrast the top eigenvalues cluster, 8 power steps under-read
    # lam_max by 20-30% (measured at 48^3: carried 1.66/2.21 vs true
    # >= 1.83/2.69) and the smoother diverges on the missed band (CG
    # stalls at maxiter).  Estimated/Gershgorin bounds are either unsafe
    # or ~2.5x loose for elasticity (sign cancellations); the l1
    # regularization of the smoother itself makes lam_max <= 1 EXACT,
    # with no spectral estimation anywhere.

    def _fine_l1_binv(self, scale, free_mask):
        """Inverse l1-regularized 3x3 nodal blocks of the fine operator,
        chunk-assembled; BC rows/cols masked to identity."""
        sc = scale.astype(self.Pn.dtype)
        B = jnp.zeros((self.n_nodes, 3, 3), dtype=self.Pn.dtype)
        off = jnp.zeros((self.n_nodes, 3), dtype=self.Pn.dtype)
        for s, e in self.chunk_slices:
            w = sc[s:e, None, None, None]
            B = B.at[self.node_conn[s:e]].add(w * self.ke_corner[s:e])
            off = off.at[self.node_conn[s:e]].add(
                w[..., 0] * self.ke_l1off[s:e])
        eye = jnp.eye(3, dtype=self.Pn.dtype)[None]
        B = B + off[:, :, None] * eye
        m = free_mask.reshape(self.n_nodes, 3).astype(self.Pn.dtype)
        B = B * m[:, :, None] * m[:, None, :]
        B = B + (1.0 - m)[:, :, None] * eye
        return jnp.linalg.inv(B)

    def _level_l1_binv(self, l, blocks):
        """Inverse l1-regularized 6x6 diagonal blocks of A_l."""
        pos, has = self.diag_idx[l]
        D = blocks[pos] * has[:, None, None].astype(blocks.dtype)
        absrow = jnp.zeros((self.sizes[l], 6), dtype=blocks.dtype)
        absrow = absrow.at[self.pair_rows[l]].add(
            jnp.abs(blocks).sum(axis=-1))
        off = absrow - jnp.abs(D).sum(axis=-1)
        eye = jnp.eye(6, dtype=blocks.dtype)[None]
        B = D + off[:, :, None] * eye
        d = jnp.diagonal(B, axis1=1, axis2=2)
        fix = (d <= 1e-30).astype(B.dtype)
        B = B + fix[:, :, None] * eye
        return jnp.linalg.inv(B)

    def _coarsest_factor(self, blocks):
        """Dense coarsest assembly + DIAGONALLY-SCALED regularized Cholesky.

        Symmetric diagonal scaling before factorizing, exactly like the
        voxel path's _scaled_cholesky (ops/multigrid.py): SIMP contrast
        lives almost entirely in the diagonal, and the raw fp32
        factorization produces NaNs on TPU where the unit-diagonal scaled
        one stays finite.  Zero rows (rank-deficient aggregate padding in
        the RBM basis) get identity pivots; their residuals are exactly
        zero, so the identity never enters the correction.  Returns
        (L, dinv_sqrt) with A ~= D^1/2 (L L^T) D^1/2."""
        nL = self.sizes[-1]
        rows, cols = self.pair_rows[-1], self.pair_cols[-1]
        Ac = jnp.zeros((nL, 6, nL, 6), dtype=blocks.dtype)
        Ac = Ac.at[rows, :, cols, :].add(blocks)
        Ac = Ac.reshape(self.nc, self.nc)
        d = jnp.diagonal(Ac)
        live = d > 1e-30
        dinv_sqrt = jnp.where(live, 1.0 / jnp.sqrt(jnp.maximum(d, 1e-30)),
                              1.0)
        As = Ac * dinv_sqrt[:, None] * dinv_sqrt[None, :]
        fix = 1.0 - live.astype(Ac.dtype)
        shift = 100.0 * jnp.finfo(Ac.dtype).eps
        As = As + (fix + shift) * jnp.eye(self.nc, dtype=Ac.dtype)
        return (jax.scipy.linalg.cholesky(As, lower=True), dinv_sqrt)

    @_highest_precision
    def setup(self, scale, free_mask, Binv, A):
        """Once per SIMP iteration.  Returns the opaque state pytree for
        `apply`: per-level operator blocks + l1-regularized block-Jacobi
        smoother inverses (lam_max(B^-1 A) <= 1 by construction) and the
        coarsest Cholesky factor.  `Binv`/`A` are accepted for API
        stability; smoothing uses the l1 blocks, not the plain
        block-Jacobi inverse.  With smooth_prolongator the per-level
        smoothed transfers P_s (density-dependent) join the state."""
        Binv0 = self._fine_l1_binv(scale, free_mask)
        if self.smooth_p:
            Anode = self._assemble_node_blocks(scale, free_mask)
            lam0 = self._sa_lambda(
                lambda v: self._node_matvec(Anode, v),
                lambda v: jnp.einsum("nab,nb->na", Binv0, v),
                self.n_nodes, 3, self.Pn.dtype)
            Ps0 = self._smooth_transfer(0, Anode, self.nodepair_cols,
                                        Binv0, self.Pn, (4.0 / 3.0) / lam0)
            blocks = [self._sa_galerkin(0, Anode, Ps0)]
            Ps_list = [Ps0]
            Binvs = []
            for l in range(self.n_coarse_levels - 1):
                Bl = self._level_l1_binv(l, blocks[l])
                Binvs.append(Bl)
                lam = self._sa_lambda(
                    lambda v: self._matvec_level(l, blocks[l], v),
                    lambda v: jnp.einsum("nab,nb->na", Bl, v),
                    self.sizes[l], 6, self.Pn.dtype)
                Psl = self._smooth_transfer(l + 1, blocks[l],
                                            self.pair_cols[l], Bl,
                                            self.P_coarse[l],
                                            (4.0 / 3.0) / lam)
                Ps_list.append(Psl)
                blocks.append(self._sa_galerkin(l + 1, blocks[l], Psl))
            L = self._coarsest_factor(blocks[-1])
            return {"blocks": tuple(blocks[:-1]), "Binvs": tuple(Binvs),
                    "L": L, "Binv0": Binv0, "Ps": tuple(Ps_list)}
        blocks = [self._assemble_level1(scale)]
        for l in range(self.n_coarse_levels - 1):
            blocks.append(self._galerkin_next(l, blocks[-1]))
        Binvs = [self._level_l1_binv(l, blocks[l])
                 for l in range(self.n_coarse_levels - 1)]
        L = self._coarsest_factor(blocks[-1])
        return {"blocks": tuple(blocks[:-1]), "Binvs": tuple(Binvs),
                "L": L, "Binv0": Binv0}

    @staticmethod
    def _chebyshev(Bapply, Aapply, r, x, iters):
        """Degree-`iters` Chebyshev polynomial in (B^-1 A) over the FIXED
        interval [1/6, 1] — same three-term recurrence and interval ratio
        as the voxel multigrid (ops/multigrid.py _smooth); the single
        damped-Jacobi sweep it replaces is the textbook cause of
        size-degrading convergence for unsmoothed-aggregation AMG, and
        the l1 smoother blocks make lam_max <= 1 exact (see above).
        x=None means the initial iterate is exactly zero (pre-smooth),
        saving one operator apply."""
        lam_max = 1.0
        lam_min = lam_max / 6.0
        theta = 0.5 * (lam_max + lam_min)
        delta = 0.5 * (lam_max - lam_min)
        sigma = theta / delta
        res = r if x is None else r - Aapply(x)
        d = Bapply(res) / theta
        x = d if x is None else x + d
        rho_old = 1.0 / sigma
        for _ in range(1, iters):
            rho = 1.0 / (2.0 * sigma - rho_old)
            res = r - Aapply(x)
            d = (rho * rho_old) * d + (2.0 * rho / delta) * Bapply(res)
            x = x + d
            rho_old = rho
        return x

    # ----- per-CG-iteration V-cycle (device) -------------------------------
    def _cycle(self, l, state, r):
        """Symmetric V-cycle on coarse level l; r (n_l, 6)."""
        if l == self.n_coarse_levels - 1:
            L, dinv_sqrt = state["L"]
            rf = r.reshape(-1) * dinv_sqrt
            zc = dinv_sqrt * jax.scipy.linalg.cho_solve((L, True), rf)
            return zc.reshape(r.shape)
        blocks = state["blocks"][l]
        Binv = state["Binvs"][l]
        Bapply = lambda v: jnp.einsum("nij,nj->ni", Binv, v)
        Aapply = lambda v: self._matvec_level(l, blocks, v)
        deg = self.smooth_iters[1]
        z = self._chebyshev(Bapply, Aapply, r, None, deg)
        res = r - Aapply(z)
        if self.smooth_p:
            Ps = state["Ps"][l + 1]
            na_r, na_c = self._sa_na[l + 1]
            rc = jnp.zeros((self.sizes[l + 1], 6), dtype=r.dtype)
            rc = rc.at[na_c].add(jnp.einsum("pki,pk->pi", Ps, res[na_r]))
            zc = self._cycle(l + 1, state, rc)
            z = z + jnp.zeros_like(z).at[na_r].add(
                jnp.einsum("pki,pi->pk", Ps, zc[na_c]))
        else:
            P = self.P_coarse[l]
            rc = jnp.zeros((self.sizes[l + 1], 6), dtype=r.dtype)
            rc = rc.at[self.agg_coarse[l]].add(
                jnp.einsum("nki,nk->ni", P, res))
            zc = self._cycle(l + 1, state, rc)
            z = z + jnp.einsum("nki,ni->nk", P, zc[self.agg_coarse[l]])
        return self._chebyshev(Bapply, Aapply, r, z, deg)

    @_highest_precision
    def apply(self, r, A, Binv, state, free_mask):
        """Symmetric multilevel cycle: Chebyshev l1-block-Jacobi
        pre-smooth, recursive coarse correction, matching post-smooth.
        `Binv` is accepted for API stability; smoothing uses the l1
        blocks in `state`."""
        B0 = state["Binv0"]
        Bapply = lambda v: jnp.einsum(
            "nij,nj->ni", B0, v.reshape(self.n_nodes, 3)).reshape(-1)
        deg = self.smooth_iters[0]
        z = self._chebyshev(Bapply, A, r, None, deg)
        res = (r - A(z)) * free_mask
        if self.smooth_p:
            Ps = state["Ps"][0]
            na_r, na_c = self._sa_na[0]
            rn = res.reshape(self.n_nodes, 3)
            rc = jnp.zeros((self.sizes[0], 6), dtype=r.dtype)
            rc = rc.at[na_c].add(jnp.einsum("pki,pk->pi", Ps, rn[na_r]))
            zc = self._cycle(0, state, rc)
            corr = jnp.zeros_like(rn).at[na_r].add(
                jnp.einsum("pki,pi->pk", Ps, zc[na_c]))
            z = z + corr.reshape(-1) * free_mask
        else:
            rc = self.restrict(res)
            zc = self._cycle(0, state, rc.reshape(self.sizes[0], 6))
            z = z + self.prolong(zc.reshape(-1)) * free_mask
        return self._chebyshev(Bapply, A, r, z, deg)
