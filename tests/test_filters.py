"""Filter parity: convolution filters vs literal neighbor-loop reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from easysimp_tpu import generate_grid
from easysimp_tpu.ops.filters import UnstructuredFilter, VoxelFilter, \
    create_filter_cache
from reference_impl import ReferenceFilter


@pytest.fixture(scope="module")
def setup():
    grid = generate_grid((7, 5, 4), (0.0, 0.0, 0.0), (7.0, 5.0, 4.0))
    ratio = 2.5
    radius = ratio * grid.characteristic_element_size
    vols = np.full(grid.n_cells, grid.element_volume)
    ref = ReferenceFilter(grid.cell_centers, vols, radius)
    vf = VoxelFilter(grid, ratio, dtype=jnp.float64)
    uf = UnstructuredFilter(grid.cell_centers, vols, radius, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    rho = rng.uniform(0.01, 1.0, grid.n_cells)
    sens = -rng.uniform(0.1, 10.0, grid.n_cells)
    return grid, ref, vf, uf, rho, sens


def to3d(grid, flat):
    return jnp.asarray(grid.cells_3d(flat))


class TestVoxelFilter:
    def test_density_filter(self, setup):
        grid, ref, vf, _, rho, _ = setup
        got = grid.cells_flat(np.asarray(vf.density_filter(to3d(grid, rho))))
        np.testing.assert_allclose(got, ref.density_filter(rho), rtol=1e-12)

    def test_sensitivity_filter(self, setup):
        grid, ref, vf, _, rho, sens = setup
        got = grid.cells_flat(
            np.asarray(vf.sensitivity_filter(to3d(grid, rho), to3d(grid, sens)))
        )
        np.testing.assert_allclose(
            got, ref.sensitivity_filter(rho, sens), rtol=1e-12
        )

    def test_sensitivity_filter_low_density_guard(self, setup):
        """rho below 1e-3 must hit the Sigmund-2007 safe-density guard."""
        grid, ref, vf, _, _, sens = setup
        rho = np.full(grid.n_cells, 1e-5)
        got = grid.cells_flat(
            np.asarray(vf.sensitivity_filter(to3d(grid, rho), to3d(grid, sens)))
        )
        np.testing.assert_allclose(
            got, ref.sensitivity_filter(rho, sens), rtol=1e-12
        )

    def test_chain_rule(self, setup):
        grid, ref, vf, _, _, sens = setup
        got = grid.cells_flat(np.asarray(vf.chain_rule(to3d(grid, sens))))
        np.testing.assert_allclose(got, ref.chain_rule(sens), rtol=1e-12)

    def test_chain_rule_is_transpose_of_density_filter(self, setup):
        """<H x, y> == <x, H^T y> with the volume weighting folded in."""
        grid, _, vf, _, rho, sens = setup
        rng = np.random.default_rng(8)
        x = rng.standard_normal(grid.n_cells)
        y = rng.standard_normal(grid.n_cells)
        Hx = grid.cells_flat(np.asarray(vf.density_filter(to3d(grid, x))))
        HTy = grid.cells_flat(np.asarray(vf.chain_rule(to3d(grid, y))))
        assert np.isclose(np.dot(Hx, y), np.dot(x, HTy), rtol=1e-12)

    def test_anisotropic_spacing(self):
        grid = generate_grid((6, 4, 3), (0.0, 0.0, 0.0), (3.0, 4.0, 4.5))
        radius = 2.0 * grid.characteristic_element_size
        vols = np.full(grid.n_cells, grid.element_volume)
        ref = ReferenceFilter(grid.cell_centers, vols, radius)
        vf = VoxelFilter(grid, 2.0, dtype=jnp.float64)
        assert np.isclose(vf.filter_radius, radius)
        rng = np.random.default_rng(9)
        rho = rng.uniform(0.1, 1.0, grid.n_cells)
        got = grid.cells_flat(np.asarray(vf.density_filter(to3d(grid, rho))))
        np.testing.assert_allclose(got, ref.density_filter(rho), rtol=1e-12)


class TestUnstructuredFilter:
    def test_all_three_match_reference(self, setup):
        grid, ref, _, uf, rho, sens = setup
        np.testing.assert_allclose(
            np.asarray(uf.density_filter(jnp.asarray(rho))),
            ref.density_filter(rho), rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(uf.sensitivity_filter(jnp.asarray(rho), jnp.asarray(sens))),
            ref.sensitivity_filter(rho, sens), rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(uf.chain_rule(jnp.asarray(sens))),
            ref.chain_rule(sens), rtol=1e-12,
        )

    def test_nonuniform_volumes(self):
        rng = np.random.default_rng(11)
        centers = rng.uniform(0, 4, (150, 3))
        vols = rng.uniform(0.5, 2.0, 150)
        ref = ReferenceFilter(centers, vols, 1.0)
        uf = UnstructuredFilter(centers, vols, 1.0, dtype=jnp.float64)
        rho = rng.uniform(0.05, 1.0, 150)
        sens = -rng.uniform(0.1, 5.0, 150)
        np.testing.assert_allclose(
            np.asarray(uf.density_filter(jnp.asarray(rho))),
            ref.density_filter(rho), rtol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(uf.sensitivity_filter(jnp.asarray(rho), jnp.asarray(sens))),
            ref.sensitivity_filter(rho, sens), rtol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(uf.chain_rule(jnp.asarray(sens))),
            ref.chain_rule(sens), rtol=1e-11,
        )


def test_create_filter_cache_dispatch():
    grid = generate_grid((4, 4, 4))
    f = create_filter_cache(grid, 1.5)
    assert isinstance(f, VoxelFilter)
    assert np.isclose(f.filter_radius, 1.5)
