"""Golden-file cache for the scipy direct-solve oracle trajectories.

The slow parity tests each re-run ``simp_optimize_reference`` — a sparse
Cholesky factorization per SIMP iteration on 16k-36k-element meshes —
which dominates the suite wall time (~47 of 80 min).  The oracle is
deterministic in its inputs, so its outputs are cached as committed
``tests/golden/*.npz`` files keyed by a sha256 digest of every input array,
every keyword parameter, and the bytes of ``reference_impl.py`` itself:
any change to the mesh, loads, parameters, or the oracle implementation
misses the cache and recomputes.  The tests' assertions are unchanged —
they compare the library against exactly what a fresh oracle run would
return.

Regeneration: ``EASYSIMP_REGEN_GOLDEN=1 python -m pytest -m slow`` (or
delete ``tests/golden/*.npz``).
"""

import hashlib
import os

import numpy as np

import reference_impl

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")

_SCALARS = ("final_energy", "converged", "total_volume", "filter_radius")


def _feed(h, obj):
    """Feed an oracle argument into the digest, type-tagged."""
    if isinstance(obj, np.ndarray):
        h.update(f"nd:{obj.dtype}:{obj.shape}".encode())
        h.update(np.ascontiguousarray(obj).tobytes())
    elif isinstance(obj, (list, tuple)):
        h.update(f"seq:{len(obj)}".encode())
        for v in obj:
            _feed(h, v)
    else:
        h.update(repr(obj).encode())


def _digest(points, conn, fixed_dofs, f_ext, kw):
    h = hashlib.sha256()
    with open(reference_impl.__file__, "rb") as fh:
        h.update(fh.read())
    for a in (points, conn, fixed_dofs, f_ext):
        _feed(h, np.asarray(a))
    for k in sorted(kw):
        h.update(k.encode())
        _feed(h, kw[k])
    return h.hexdigest()


def simp_optimize_reference_cached(tag, points, conn, fixed_dofs, f_ext,
                                   **kw):
    """Drop-in for ``simp_optimize_reference`` with a golden-file cache."""
    digest = _digest(points, conn, fixed_dofs, f_ext, kw)
    path = os.path.join(GOLDEN_DIR, f"{tag}.npz")
    regen = os.environ.get("EASYSIMP_REGEN_GOLDEN", "0") == "1"
    if not regen and os.path.exists(path):
        with np.load(path, allow_pickle=False) as d:
            if str(d["digest"]) == digest:
                ref = {k: d[k] for k in d.files if k != "digest"}
                ref["density_history"] = list(ref["density_history"])
                for k in _SCALARS:
                    ref[k] = ref[k].item()
                for k in ("energies", "volumes", "changes"):
                    ref[k] = ref[k].tolist()
                return ref
        print(f"[golden] stale digest for {tag}; recomputing oracle")
    ref = reference_impl.simp_optimize_reference(
        points, conn, fixed_dofs, f_ext, **kw)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(
        path, digest=np.str_(digest),
        **{k: (np.stack(v) if k == "density_history"
               else np.asarray(v)) for k, v in ref.items()})
    return ref
