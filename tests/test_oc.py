"""OC update parity against the literal bisection port."""

import numpy as np
import jax.numpy as jnp

from easysimp_tpu.ops.oc import oc_update, sensitivity_health
from reference_impl import ReferenceFilter, oc_update_reference


def random_state(n=200, seed=5):
    rng = np.random.default_rng(seed)
    rho = rng.uniform(0.05, 0.95, n)
    sens = -rng.uniform(0.01, 5.0, n)
    vols = np.full(n, 1.0)
    vol_sens = vols / vols.sum()
    return rho, sens, vols, vol_sens, rng


class TestOCUpdate:
    def test_matches_reference_port(self):
        rho, sens, vols, vol_sens, _ = random_state()
        new_ref, lam_ref = oc_update_reference(
            rho, sens, vol_sens, 0.4, vols.sum(), vols, 0.2, 0.5
        )
        new, lam, its, verr = oc_update(
            jnp.asarray(rho), jnp.asarray(sens), jnp.asarray(vol_sens),
            0.4, vols.sum(), jnp.asarray(vols), 0.2, 0.5,
        )
        np.testing.assert_allclose(np.asarray(new), new_ref, rtol=1e-12,
                                   atol=1e-14)
        assert np.isclose(float(lam), lam_ref, rtol=1e-9)

    def test_volume_constraint_satisfied(self):
        rho, sens, vols, vol_sens, _ = random_state(seed=6)
        new, lam, its, verr = oc_update(
            jnp.asarray(rho), jnp.asarray(sens), jnp.asarray(vol_sens),
            0.5, vols.sum(), jnp.asarray(vols), 0.2, 0.5,
        )
        # absolute tolerance 1e-6 (OptimalityCriteria.jl:91,128)
        assert abs(float(jnp.sum(new * jnp.asarray(vols))) - 0.5 * vols.sum()) < 1e-6

    def test_bounds_and_move_limits(self):
        rho, sens, vols, vol_sens, _ = random_state(seed=7)
        new, _, _, _ = oc_update(
            jnp.asarray(rho), jnp.asarray(sens), jnp.asarray(vol_sens),
            0.4, vols.sum(), jnp.asarray(vols), 0.2, 0.5,
        )
        new = np.asarray(new)
        assert np.all(new >= 1e-3 - 1e-15)
        assert np.all(new <= 1.0 + 1e-15)
        assert np.all(new <= rho + 0.2 + 1e-12)
        assert np.all(new >= np.maximum(rho - 0.2, 1e-3) - 1e-12)

    def test_with_density_filter_in_bisection(self):
        """Density filter re-applied inside every bisection step
        (OptimalityCriteria.jl:119-125)."""
        rng = np.random.default_rng(12)
        centers = rng.uniform(0, 5, (120, 3))
        vols = rng.uniform(0.8, 1.2, 120)
        radius = 1.2
        ref_filt = ReferenceFilter(centers, vols, radius)

        from easysimp_tpu.ops.filters import UnstructuredFilter

        filt = UnstructuredFilter(centers, vols, radius, dtype=jnp.float64)

        rho = rng.uniform(0.1, 0.9, 120)
        sens = -rng.uniform(0.01, 3.0, 120)
        vol_sens = ref_filt.chain_rule(vols / vols.sum())

        new_ref, lam_ref = oc_update_reference(
            rho, sens, vol_sens, 0.45, vols.sum(), vols, 0.2, 0.5,
            density_filter=ref_filt.density_filter,
        )
        new, lam, _, _ = oc_update(
            jnp.asarray(rho), jnp.asarray(sens), jnp.asarray(vol_sens),
            0.45, vols.sum(), jnp.asarray(vols), 0.2, 0.5,
            apply_physical=filt.density_filter,
        )
        np.testing.assert_allclose(np.asarray(new), new_ref, rtol=1e-10,
                                   atol=1e-12)
        # physical volume satisfied
        phys = np.asarray(filt.density_filter(new))
        assert abs(np.dot(phys, vols) - 0.45 * vols.sum()) < 1e-6

    def test_volume_weights_identity(self):
        """The linear-filter identity sum(H x * V) == dot(x, H^T V) lets the
        drivers replace the filter-in-bisection with precomputed weights;
        the result must match the conv-in-loop path (and the literal port)
        to fp rounding."""
        rng = np.random.default_rng(21)
        centers = rng.uniform(0, 5, (120, 3))
        vols = rng.uniform(0.8, 1.2, 120)
        radius = 1.2

        from easysimp_tpu.ops.filters import UnstructuredFilter

        filt = UnstructuredFilter(centers, vols, radius, dtype=jnp.float64)
        rho = rng.uniform(0.1, 0.9, 120)
        sens = -rng.uniform(0.01, 3.0, 120)
        vol_sens = np.asarray(filt.chain_rule(jnp.asarray(vols / vols.sum())))

        new_conv, lam_conv, _, _ = oc_update(
            jnp.asarray(rho), jnp.asarray(sens), jnp.asarray(vol_sens),
            0.45, vols.sum(), jnp.asarray(vols), 0.2, 0.5,
            apply_physical=filt.density_filter,
        )
        new_w, lam_w, _, verr = oc_update(
            jnp.asarray(rho), jnp.asarray(sens), jnp.asarray(vol_sens),
            0.45, vols.sum(), jnp.asarray(vols), 0.2, 0.5,
            volume_weights=jnp.asarray(vol_sens) * vols.sum(),
        )
        np.testing.assert_allclose(np.asarray(new_w), np.asarray(new_conv),
                                   rtol=1e-10, atol=1e-12)
        assert np.isclose(float(lam_w), float(lam_conv), rtol=1e-9)
        assert abs(float(verr)) < 1e-6

    def test_verr_reports_nonconvergence(self):
        """The returned volume error drives the driver's non-convergence
        warning (OptimalityCriteria.jl:139-142): an infeasible target (volume
        below what the move limit can reach) must exit with |verr| >= tol."""
        rho = jnp.full(50, 0.9)
        sens = -jnp.ones(50)
        vols = np.full(50, 1.0)
        vol_sens = jnp.asarray(vols / vols.sum())
        new, lam, its, verr = oc_update(
            rho, sens, vol_sens, 0.05, vols.sum(), jnp.asarray(vols), 0.2, 0.5,
        )
        # move limit floors densities at 0.7 -> volume 35 vs target 2.5
        assert abs(float(verr)) >= 1e-6
        np.testing.assert_allclose(np.asarray(new), 0.7, rtol=1e-12)


def test_sensitivity_health():
    vals = -np.abs(np.random.default_rng(1).standard_normal(100))
    sens = jnp.asarray(vals)
    frac_neg, mean_abs, max_abs = sensitivity_health(sens)
    assert float(frac_neg) == 1.0
    np.testing.assert_allclose(float(mean_abs), np.abs(vals).mean(),
                               rtol=1e-6)
    np.testing.assert_allclose(float(max_abs), np.abs(vals).max(), rtol=1e-6)


def test_host_median_abs():
    from easysimp_tpu.ops.oc import host_median_abs

    vals = np.random.default_rng(2).standard_normal(10_000)
    med = host_median_abs(jnp.asarray(vals))
    # full-array median (size below the subsample cap -> stride 1, exact)
    np.testing.assert_allclose(med, np.median(np.abs(vals)), rtol=1e-6)


def test_warn_sensitivity_health_median_semantics(capsys):
    """max/median > 1e8 warns (OptimalityCriteria.jl:33-36) even when
    max/mean stays small — the median-centered check the mean cannot mimic."""
    from easysimp_tpu.opt.optimize import _warn_sensitivity_health

    # half the entries huge, half tiny: median tiny, mean huge
    sens = np.full(1000, -1e-6)
    sens[:499] = -1e4
    fired = _warn_sensitivity_health(1.0, 1e4, jnp.asarray(sens))
    assert fired
    assert "max/median" in capsys.readouterr().out
