"""Golden-file oracle cache (tests/golden.py): round-trip fidelity.

The slow parity marks rely on the cache returning EXACTLY what a fresh
``simp_optimize_reference`` run returns — same keys, same values to the
bit — and on the digest missing when any input or the oracle source
changes.
"""

import numpy as np

import easysimp_tpu as et
import golden
from test_optimize import build_cantilever, run_reference


def _setup():
    grid, bc, load, params = build_cantilever((6, 4, 2), max_iter=3)
    f = np.asarray(et.build_load_field(grid, [load]), dtype=np.float64)
    f_flat = grid.dofs_flat(f)
    mask = et.build_free_mask(grid, [bc])
    fixed = np.nonzero(grid.dofs_flat(mask) == 0)[0]
    kw = dict(E0=params.E0, Emin=params.Emin, nu=params.nu, p=params.p,
              volume_fraction=params.volume_fraction, max_iterations=3,
              tolerance=params.tolerance,
              filter_radius_ratio=params.filter_radius)
    return grid, fixed, f_flat, kw


def test_cache_roundtrip_bitexact(tmp_path, monkeypatch):
    monkeypatch.setattr(golden, "GOLDEN_DIR", str(tmp_path))
    grid, fixed, f_flat, kw = _setup()
    args = (grid.node_coords, grid.hex_connectivity, fixed, f_flat)
    ref1 = golden.simp_optimize_reference_cached("t", *args, **kw)
    assert (tmp_path / "t.npz").exists()
    ref2 = golden.simp_optimize_reference_cached("t", *args, **kw)
    assert set(ref1) == set(ref2)
    for k, v in ref1.items():
        if k == "density_history":
            np.testing.assert_array_equal(np.stack(v), np.stack(ref2[k]))
        else:
            np.testing.assert_array_equal(np.asarray(v), np.asarray(ref2[k]))
    assert isinstance(ref2["final_energy"], float)
    assert isinstance(ref2["energies"], list)
    assert ref2["converged"] in (True, False)


def test_cache_misses_on_changed_input(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(golden, "GOLDEN_DIR", str(tmp_path))
    grid, fixed, f_flat, kw = _setup()
    args = (grid.node_coords, grid.hex_connectivity, fixed, f_flat)
    golden.simp_optimize_reference_cached("t", *args, **kw)
    ref3 = golden.simp_optimize_reference_cached(
        "t", *args, **{**kw, "volume_fraction": 0.5})
    assert "stale digest" in capsys.readouterr().out
    assert abs(np.dot(ref3["final_densities"],
                      np.ones(len(ref3["final_densities"]))) / grid.n_cells
               - 0.5) < 1e-5


def test_run_reference_tagged_matches_untagged(tmp_path, monkeypatch):
    monkeypatch.setattr(golden, "GOLDEN_DIR", str(tmp_path))
    grid, bc, load, params = build_cantilever((6, 4, 2), max_iter=3)
    ref_direct = run_reference(grid, bc, load, params)
    ref_cached = run_reference(grid, bc, load, params, tag="rt")
    np.testing.assert_array_equal(ref_direct["energies"],
                                  ref_cached["energies"])
    np.testing.assert_array_equal(ref_direct["final_densities"],
                                  ref_cached["final_densities"])
