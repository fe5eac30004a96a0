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


def test_masked_matvec_matches_gspmd_and_single_device(setup):
    """Certification (round-3 VERDICT item 6): the explicit-ppermute masked
    matvec — the CG operator action — equals BOTH the single-device
    VoxelOperator.apply and the production GSPMD-sharded apply (same jitted
    function, inputs device_put over the mesh, XLA infers the halo
    collectives) on a multi-shard problem with a real BC mask."""
    from jax.sharding import NamedSharding

    grid, op, halo, mesh, u, rho = setup
    bc = et.apply_fixed_boundary(
        grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
    mask = np.asarray(et.build_free_mask(grid, [bc]), dtype=np.float64)
    scale = op.youngs_modulus(jnp.asarray(rho))

    want = np.asarray(op.apply(jnp.asarray(u), scale, jnp.asarray(mask)))

    # production GSPMD path: PADDED + sharded node storage exactly like the
    # driver (crop to the exact shape inside the program, re-pad the output)
    from easysimp_tpu.parallel.sharding import (
        cell_sharding, shard_voxel_state)

    (s_g,), (u_g, m_g) = shard_voxel_state(
        mesh, cell_fields=(scale,), node_fields=(jnp.asarray(u),
                                                 jnp.asarray(mask)))
    nnx, nny, nnz = grid.nnodes_per_axis

    def padded_apply(up, sp, mp):
        crop = lambda a: a[:nnx, :nny, :nnz]
        out = op.apply(crop(up), sp, crop(mp))
        pads = [(0, p - s) for p, s in zip(up.shape[:3], out.shape[:3])]
        return jnp.pad(out, pads + [(0, 0)])

    gspmd = jax.jit(padded_apply)
    got_gspmd = np.asarray(gspmd(u_g, s_g, m_g))[:nnx, :nny, :nnz]
    np.testing.assert_allclose(got_gspmd, want, rtol=1e-12, atol=1e-12)

    # explicit halo path
    mv = halo.make_sharded_masked_matvec()
    u_s = jax.device_put(halo.to_local_layout(u),
                         NamedSharding(mesh, halo.shard_spec_nodes()))
    m_s = jax.device_put(halo.to_local_layout(mask),
                         NamedSharding(mesh, halo.shard_spec_nodes()))
    s_s = jax.device_put(scale, NamedSharding(mesh, halo.shard_spec_cells()))
    got_halo = halo.from_local_layout(mv(u_s, s_s, m_s))
    np.testing.assert_allclose(got_halo, want, rtol=1e-12, atol=1e-12)

    # both compiled programs move halo planes over the device mesh
    halo_hlo = mv.lower(u_s, s_s, m_s).compile().as_text()
    assert "collective-permute" in halo_hlo
    gspmd_hlo = gspmd.lower(u_g, s_g, m_g).compile().as_text()
    assert "collective-permute" in gspmd_hlo


def test_masked_reduction_matches_single_device(setup):
    """CG-style masked <r, z> through pvdot == the single-device value."""
    from functools import partial
    from jax.sharding import NamedSharding

    grid, op, halo, mesh, u, rho = setup
    bc = et.apply_fixed_boundary(
        grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
    mask = np.asarray(et.build_free_mask(grid, [bc]), dtype=np.float64)
    r = np.asarray(u) * mask
    z = (np.asarray(u) ** 2 + 1.0) * mask
    want = np.vdot(r, z)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(halo.shard_spec_nodes(), halo.shard_spec_nodes()),
             out_specs=jax.sharding.PartitionSpec())
    def dot(a, b):
        return halo.pvdot(a, b)

    a = jax.device_put(halo.to_local_layout(r),
                       NamedSharding(mesh, halo.shard_spec_nodes()))
    b = jax.device_put(halo.to_local_layout(z),
                       NamedSharding(mesh, halo.shard_spec_nodes()))
    assert np.isclose(float(dot(a, b)), want, rtol=1e-12)


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
