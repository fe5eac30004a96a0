"""Native C++ neighbor search vs scipy cKDTree."""

import numpy as np
import pytest

from easysimp_tpu.native import is_available, neighbor_search


@pytest.mark.skipif(not is_available(), reason="g++ build unavailable")
class TestNativeNeighborSearch:
    def test_matches_scipy(self):
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(0)
        centers = rng.uniform(0, 10, (2000, 3))
        radius = 0.8
        offsets, idx, w = neighbor_search(centers, radius)

        tree = cKDTree(centers)
        lists = tree.query_ball_point(centers, r=radius)
        assert offsets[-1] == sum(len(l) for l in lists)
        for i in [0, 17, 500, 1999]:
            mine = set(idx[offsets[i] : offsets[i + 1]].tolist())
            assert mine == set(lists[i])
            d = np.linalg.norm(centers[sorted(mine)] - centers[i], axis=1)
            w_sorted = w[offsets[i] : offsets[i + 1]][
                np.argsort(idx[offsets[i] : offsets[i + 1]])]
            np.testing.assert_allclose(
                w_sorted, np.maximum(0.0, radius - d), atol=1e-12)

    def test_self_always_included(self):
        rng = np.random.default_rng(1)
        centers = rng.uniform(0, 5, (300, 3))
        offsets, idx, w = neighbor_search(centers, 0.5)
        for i in range(300):
            assert i in idx[offsets[i] : offsets[i + 1]]

    def test_filter_uses_it_consistently(self):
        """UnstructuredFilter results are identical regardless of which
        backend built the neighbor lists (weights are deterministic)."""
        import jax.numpy as jnp

        from easysimp_tpu.ops.filters import UnstructuredFilter

        rng = np.random.default_rng(2)
        centers = rng.uniform(0, 4, (400, 3))
        vols = rng.uniform(0.5, 1.5, 400)
        f = UnstructuredFilter(centers, vols, 0.7, dtype=jnp.float64)
        rho = rng.uniform(0.1, 1.0, 400)
        out = np.asarray(f.density_filter(jnp.asarray(rho)))
        # reference check vs literal loops
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from reference_impl import ReferenceFilter

        ref = ReferenceFilter(centers, vols, 0.7)
        np.testing.assert_allclose(out, ref.density_filter(rho), rtol=1e-12)
