"""ops layer: LM solver, batched polyfit, poly intersection, small linalg."""

import jax
import jax.numpy as jnp
import numpy as np

from cylinder_pose_estimation_tpu.ops.linalg import eigh2x2, pca_components
from cylinder_pose_estimation_tpu.ops.lm import levenberg_marquardt
from cylinder_pose_estimation_tpu.ops.polyfit import (
    masked_polyfit,
    poly_domain,
    poly_intersection,
    polyval,
)


def test_lm_solves_rosenbrock_ls():
    def residual(p):
        return jnp.asarray([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

    res = levenberg_marquardt(residual, jnp.asarray([-1.2, 1.0]), iters=100)
    np.testing.assert_allclose(np.asarray(res.params), [1.0, 1.0], atol=1e-4)
    assert float(res.cost) < 1e-8


def test_lm_masked_weights():
    target = jnp.asarray([3.0, -2.0])

    def residual(p):
        r = jnp.concatenate([p - target, (p - 100.0)])  # last 2 are poisoned
        return r

    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    res = levenberg_marquardt(residual, jnp.zeros(2), weights=w, iters=50)
    np.testing.assert_allclose(np.asarray(res.params), np.asarray(target), atol=1e-5)


def test_lm_handles_rank_deficiency():
    # Only p[0] observable; damping must keep the solve finite.
    def residual(p):
        return jnp.asarray([p[0] - 5.0])

    res = levenberg_marquardt(residual, jnp.zeros(3), iters=50)
    assert abs(float(res.params[0]) - 5.0) < 1e-4
    assert np.all(np.isfinite(np.asarray(res.params)))


def test_masked_polyfit_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.uniform(40, 600, size=48).astype(np.float32)
    y = (0.001 * x**2 - 0.3 * x + 17 + rng.normal(0, 0.3, 48)).astype(np.float32)
    w = np.ones(48, np.float32)
    ours = np.asarray(masked_polyfit(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), 2))
    ref = np.polyfit(x, y, 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_masked_polyfit_ignores_masked_points():
    x = jnp.asarray(np.linspace(0, 100, 32), jnp.float32)
    y = 2.0 * x + 1.0
    y = y.at[:5].set(999.0)
    w = jnp.ones(32).at[:5].set(0.0)
    coeffs = np.asarray(masked_polyfit(x, y, w, 1))
    np.testing.assert_allclose(coeffs, [2.0, 1.0], atol=1e-3)


def test_masked_polyfit_batched():
    x = jnp.stack([jnp.linspace(0, 10, 16), jnp.linspace(-5, 5, 16)]).astype(jnp.float32)
    y = jnp.stack([3 * x[0] + 2, x[1] ** 2])
    w = jnp.ones_like(x)
    c = np.asarray(masked_polyfit(x, y, w, 2))
    np.testing.assert_allclose(c[0], [0.0, 3.0, 2.0], atol=1e-3)
    np.testing.assert_allclose(c[1], [1.0, 0.0, 0.0], atol=1e-3)


def test_poly_domain():
    x = jnp.asarray([10.0, 50.0, 30.0, 0.0])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    d = np.asarray(poly_domain(x, w, 50.0))
    np.testing.assert_allclose(d, [-40.0, 100.0], atol=1e-5)


def test_poly_intersection_line_line():
    # row: y = 2x + 1 ; col: x = -0.5y + 10  =>  x = -0.5(2x+1)+10 -> 2x = 9.5
    row = jnp.asarray([2.0, 1.0])
    col = jnp.asarray([-0.5, 10.0])
    x, y = poly_intersection(row, col, jnp.asarray(5.0))
    assert abs(float(x) - 4.75) < 1e-5
    assert abs(float(y) - 10.5) < 1e-5


def test_poly_intersection_quadratic():
    # row: y = 0.01x^2 + 2 ; col: x = 0.02y^2 + 3
    row = jnp.asarray([0.01, 0.0, 2.0])
    col = jnp.asarray([0.02, 0.0, 3.0])
    x, y = poly_intersection(row, col, jnp.asarray(3.0))
    xf, yf = float(x), float(y)
    assert abs(yf - (0.01 * xf**2 + 2)) < 1e-4
    assert abs(xf - (0.02 * yf**2 + 3)) < 1e-4


def test_poly_intersection_grid_broadcast():
    rows = jnp.asarray([[0.0, 0.0, 10.0], [0.0, 0.0, 20.0]])  # y = 10, y = 20
    cols = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 15.0]])   # x = 5, x = 15
    x0 = jnp.zeros((2, 2))
    x, y = poly_intersection(rows[:, None, :], cols[None, :, :], x0)
    np.testing.assert_allclose(np.asarray(x), [[5.0, 15.0], [5.0, 15.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), [[10.0, 10.0], [20.0, 20.0]], atol=1e-5)


def test_eigh2x2():
    rng = np.random.default_rng(1)
    for _ in range(20):
        a, b, c = rng.normal(size=3)
        evals, evecs = eigh2x2(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        m = np.array([[a, b], [b, c]])
        ref = np.linalg.eigvalsh(m)
        np.testing.assert_allclose(np.asarray(evals), ref, atol=1e-5)
        v = np.asarray(evecs)
        for i in range(2):
            np.testing.assert_allclose(m @ v[:, i], np.asarray(evals)[i] * v[:, i], atol=1e-4)


def test_pca_components_ordering():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(200, 3)) * np.asarray([10.0, 3.0, 0.5])
    comps, var = pca_components(jnp.asarray(pts, jnp.float32), jnp.ones(200, bool))
    v = np.asarray(var)
    assert v[0] > v[1] > v[2]
    # Least-variance axis ~ z
    assert abs(np.asarray(comps)[2, 2]) > 0.99


def test_solve_spd_matches_lu():
    """Unrolled Cholesky solve tracks the f64 solution on batched SPD systems,
    including badly row/col-scaled ones (the Jacobi-equilibration +
    iterative-refinement guards; an unguarded f32 Cholesky lost ~3 digits on
    the worst-conditioned bench LM system)."""
    from cylinder_pose_estimation_tpu.ops.linalg import solve_spd

    rng = np.random.default_rng(7)
    for p in (2, 3, 6):
        m = rng.normal(size=(32, p, p))
        a = (m @ np.swapaxes(m, -1, -2) + 0.05 * np.eye(p))
        # Mixed-scale columns, like curvature-vs-translation in the LM JtJ.
        s = 10.0 ** np.arange(p)
        a = (a * s[None, :, None] * s[None, None, :]).astype(np.float32)
        b = rng.normal(size=(32, p)).astype(np.float32)
        got = np.asarray(solve_spd(jnp.asarray(a), jnp.asarray(b)))
        want = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
        # Per-solution-norm error (per-component rel error explodes on
        # near-zero components of unlucky ill-conditioned draws).
        rel = np.linalg.norm(got - want, axis=-1) / (
            np.linalg.norm(want, axis=-1) + 1e-12)
        assert rel.max() < 1e-3, (p, rel.max())
