"""Explicit shard_map halo-exchange matvec correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import easysimp_tpu as et
from easysimp_tpu.parallel.halo import HaloVoxelOperator
from easysimp_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    grid = et.generate_grid((16, 8, 4), (0.0, 0.0, 0.0), (16.0, 8.0, 4.0))
    op = et.VoxelOperator(grid, E0=5.0, Emin=1e-9, nu=0.3, p=3.0,
                          dtype=jnp.float64)
    mesh = make_mesh(8, shape=(8, 1, 1))
    halo = HaloVoxelOperator(op, mesh)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((*grid.nnodes_per_axis, 3))
    rho = rng.uniform(0.05, 1.0, grid.nels)
    return grid, op, halo, mesh, u, rho


def test_layout_roundtrip(setup):
    grid, op, halo, mesh, u, rho = setup
    stacked = halo.to_local_layout(u)
    assert stacked.shape == (8 * (2 + 1), 9, 5, 3)
    back = halo.from_local_layout(stacked)
    np.testing.assert_array_equal(back, u)


def test_halo_matvec_matches_single_device(setup):
    grid, op, halo, mesh, u, rho = setup
    scale = op.youngs_modulus(jnp.asarray(rho))
    mask = jnp.ones((*grid.nnodes_per_axis, 3), dtype=jnp.float64)
    want = np.asarray(op.apply_K(jnp.asarray(u), scale))

    mv = halo.make_sharded_matvec()
    from jax.sharding import NamedSharding

    u_stacked = jax.device_put(
        halo.to_local_layout(u),
        NamedSharding(mesh, halo.shard_spec_nodes()))
    scale_s = jax.device_put(
        scale, NamedSharding(mesh, halo.shard_spec_cells()))
    got = halo.from_local_layout(mv(u_stacked, scale_s))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pvdot_counts_each_node_once(setup):
    grid, op, halo, mesh, u, rho = setup
    from functools import partial

    v = np.asarray(u)
    want = np.vdot(v, v)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=halo.shard_spec_nodes(),
             out_specs=jax.sharding.PartitionSpec())
    def dot(stacked):
        return halo.pvdot(stacked, stacked)

    from jax.sharding import NamedSharding

    stacked = jax.device_put(
        halo.to_local_layout(v), NamedSharding(mesh, halo.shard_spec_nodes()))
    got = float(dot(stacked))
    assert np.isclose(got, want, rtol=1e-12)
