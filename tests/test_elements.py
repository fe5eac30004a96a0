"""Element stiffness verification.

The library computes ke via the Voigt B-matrix form; reference_impl computes
it via the expanded tensor contraction — two independent derivations that must
agree to machine precision, plus physical invariants (symmetry, rigid-body
nullspace, linearity in E).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from easysimp_tpu.ops.elements import (
    HEX_CORNERS,
    hex8_stiffness,
    hex8_stiffness_batch,
    lame_parameters,
    simp_youngs_modulus,
    tet4_stiffness_batch,
)
from reference_impl import element_stiffness_tensor_form, element_volume, lame


def box_coords(spacing):
    hx, hy, hz = spacing
    return np.array(
        [[c[0] * hx, c[1] * hy, c[2] * hz] for c in HEX_CORNERS],
        dtype=np.float64,
    )


class TestMaterial:
    def test_lame_parameters(self):
        lam, mu = lame_parameters(200.0, 0.3)
        assert np.isclose(lam, 200.0 * 0.3 / (1.3 * 0.4))
        assert np.isclose(mu, 200.0 / 2.6)

    def test_simp_law(self):
        # E(rho) = Emin + (E0-Emin) rho^p (FiniteElementAnalysis.jl:107)
        assert np.isclose(simp_youngs_modulus(0.5, 200.0, 1e-6, 3.0),
                          1e-6 + (200.0 - 1e-6) * 0.125)
        assert np.isclose(simp_youngs_modulus(0.0, 1.0, 1e-9, 3.0), 1e-9)
        assert np.isclose(simp_youngs_modulus(1.0, 1.0, 1e-9, 3.0), 1.0)


class TestHex8:
    @pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (0.5, 1.25, 2.0)])
    def test_matches_tensor_form(self, spacing):
        ke = hex8_stiffness(spacing, E=7.3, nu=0.28)
        ke_ref = element_stiffness_tensor_form(box_coords(spacing), 7.3, 0.28)
        np.testing.assert_allclose(ke, ke_ref, rtol=1e-13, atol=1e-13)

    def test_symmetry_and_psd(self):
        ke = hex8_stiffness((1.0, 1.0, 1.0), E=1.0, nu=0.3)
        np.testing.assert_allclose(ke, ke.T, atol=1e-14)
        w = np.linalg.eigvalsh(ke)
        assert np.all(w > -1e-12)

    def test_rigid_body_modes(self):
        """6 zero eigenvalues: 3 translations + 3 rotations."""
        coords = box_coords((1.0, 2.0, 0.5))
        ke = hex8_stiffness((1.0, 2.0, 0.5), E=3.0, nu=0.25)
        w = np.sort(np.abs(np.linalg.eigvalsh(ke)))
        assert np.all(w[:6] < 1e-10 * w[-1])
        assert w[6] > 1e-6 * w[-1]
        # explicit rotation mode: u = omega x x
        omega = np.array([0.3, -0.7, 1.1])
        u = np.cross(omega, coords).reshape(-1)
        np.testing.assert_allclose(ke @ u, 0.0, atol=1e-10)

    def test_linear_in_E(self):
        k1 = hex8_stiffness((1.0, 1.0, 1.0), E=1.0, nu=0.3)
        k2 = hex8_stiffness((1.0, 1.0, 1.0), E=123.456, nu=0.3)
        np.testing.assert_allclose(k2, 123.456 * k1, rtol=1e-13)

    def test_batched_matches_single(self):
        spacing = (0.7, 1.1, 0.9)
        coords = box_coords(spacing)
        kb, vol = hex8_stiffness_batch(jnp.asarray(coords)[None], E=2.0, nu=0.3)
        np.testing.assert_allclose(
            np.asarray(kb[0]), hex8_stiffness(spacing, 2.0, 0.3),
            rtol=1e-12, atol=1e-12,
        )
        assert np.isclose(float(vol[0]), np.prod(spacing))

    def test_batched_distorted_matches_tensor_form(self):
        rng = np.random.default_rng(0)
        coords = box_coords((1.0, 1.0, 1.0)) + 0.08 * rng.standard_normal((8, 3))
        kb, vol = hex8_stiffness_batch(jnp.asarray(coords)[None], E=5.0, nu=0.31)
        ke_ref = element_stiffness_tensor_form(coords, 5.0, 0.31)
        np.testing.assert_allclose(np.asarray(kb[0]), ke_ref, rtol=1e-11,
                                   atol=1e-11 * np.abs(ke_ref).max())
        assert np.isclose(float(vol[0]), element_volume(coords), rtol=1e-12)


class TestTet4:
    def test_matches_tensor_form(self):
        rng = np.random.default_rng(1)
        coords = rng.standard_normal((5, 4, 3))
        # ensure positive volume (swap nodes if needed)
        for i in range(coords.shape[0]):
            J = coords[i, 1:] - coords[i, 0]
            if np.linalg.det(J) < 0:
                coords[i, [1, 2]] = coords[i, [2, 1]]
        kb, vol = tet4_stiffness_batch(jnp.asarray(coords), E=3.0, nu=0.27)
        for i in range(coords.shape[0]):
            ke_ref = element_stiffness_tensor_form(coords[i], 3.0, 0.27)
            np.testing.assert_allclose(
                np.asarray(kb[i]), ke_ref, rtol=1e-10,
                atol=1e-11 * np.abs(ke_ref).max(),
            )
            assert np.isclose(float(vol[i]), element_volume(coords[i]),
                              rtol=1e-12)

    def test_rigid_body_modes(self):
        coords = np.array(
            [[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]
        )
        kb, _ = tet4_stiffness_batch(jnp.asarray(coords)[None], E=1.0, nu=0.3)
        w = np.sort(np.abs(np.linalg.eigvalsh(np.asarray(kb[0]))))
        assert np.all(w[:6] < 1e-10 * w[-1])
        assert w[6] > 1e-6 * w[-1]
