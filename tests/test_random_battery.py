"""Random-distribution battery: every Generator distribution executes,
is deterministic per seed, chunk-grid-INDEPENDENT (the design improvement
over the reference's per-block streams), and statistically sane.
"""

import numpy as np
import pytest

import dask_array_tpu as da

_N = 30_000

# name -> (args, mean_fn, var_fn) — loose moment checks
_DISTS = {
    "random": ((), 0.5, 1 / 12),
    "standard_normal": ((), 0.0, 1.0),
    "standard_exponential": ((), 1.0, 1.0),
    "standard_cauchy": ((), None, None),
    "exponential": ((2.0,), 2.0, 4.0),
    "uniform": ((1.0, 3.0), 2.0, 4 / 12),
    "normal": ((1.5, 0.5), 1.5, 0.25),
    "beta": ((2.0, 3.0), 0.4, 0.04),
    "chisquare": ((4.0,), 4.0, 8.0),
    "gamma": ((3.0, 2.0), 6.0, 12.0),
    "standard_gamma": ((2.5,), 2.5, 2.5),
    "gumbel": ((0.0, 1.0), 0.5772, np.pi**2 / 6),
    "laplace": ((0.0, 1.0), 0.0, 2.0),
    "logistic": ((0.0, 1.0), 0.0, np.pi**2 / 3),
    "lognormal": ((0.0, 0.5), np.exp(0.125), None),
    "pareto": ((4.0,), 1 / 3, None),
    "power": ((3.0,), 0.75, None),
    "rayleigh": ((1.0,), np.sqrt(np.pi / 2), None),
    "standard_t": ((10.0,), 0.0, 10 / 8),
    "triangular": ((0.0, 1.0, 2.0), 1.0, None),
    "wald": ((2.0, 3.0), 2.0, None),
    "weibull": ((2.0,), 0.8862, None),
    "vonmises": ((0.5, 2.0), None, None),
    "poisson": ((3.5,), 3.5, 3.5),
    "binomial": ((10, 0.3), 3.0, 2.1),
    "geometric": ((0.25,), 4.0, 12.0),
    "negative_binomial": ((5, 0.5), 5.0, 10.0),
}


@pytest.mark.parametrize("name", sorted(_DISTS))
def test_distribution_runs_and_moments(name):
    args, mean, var = _DISTS[name]
    r = da.random.default_rng(1234)
    s = np.asarray(getattr(r, name)(*args, size=(_N,), chunks=_N // 4).compute())
    assert s.shape == (_N,)
    assert np.isfinite(s).all() or name == "standard_cauchy"
    if mean is not None:
        tol = 6 * max(1.0, abs(mean)) / np.sqrt(_N) * (np.sqrt(var) if var else 3.0)
        assert abs(s.mean() - mean) < max(tol, 0.08), (s.mean(), mean)
    if var is not None:
        assert abs(s.var() - var) < max(0.35 * var, 0.1), (s.var(), var)


@pytest.mark.parametrize("name", ["standard_normal", "poisson", "uniform"])
def test_deterministic_per_seed(name):
    args = _DISTS[name][0]
    a = np.asarray(getattr(da.random.default_rng(7), name)(*args, size=(512,), chunks=128).compute())
    b = np.asarray(getattr(da.random.default_rng(7), name)(*args, size=(512,), chunks=128).compute())
    c = np.asarray(getattr(da.random.default_rng(8), name)(*args, size=(512,), chunks=128).compute())
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_chunk_grid_independent_values():
    # the same seed gives the SAME values regardless of chunking (design
    # improvement over the reference's per-block bit-generator spawning)
    a = np.asarray(da.random.default_rng(3).standard_normal((600,), chunks=100).compute())
    b = np.asarray(da.random.default_rng(3).standard_normal((600,), chunks=(337, 263)).compute())
    np.testing.assert_array_equal(a, b)


def test_successive_draws_differ():
    r = da.random.default_rng(0)
    a = np.asarray(r.standard_normal((256,), chunks=64).compute())
    b = np.asarray(r.standard_normal((256,), chunks=64).compute())
    assert not np.array_equal(a, b)


def test_integers_bounds():
    r = da.random.default_rng(11)
    s = np.asarray(r.integers(3, 9, size=(5000,), chunks=1000).compute())
    assert s.min() >= 3 and s.max() <= 8
    s2 = np.asarray(r.integers(3, 9, size=(5000,), endpoint=True, chunks=1000).compute())
    assert s2.max() == 9


def test_choice_and_permutation():
    r = da.random.default_rng(21)
    s = np.asarray(da.random.choice(10, size=(2000,), chunks=500).compute())
    assert set(np.unique(s)) <= set(range(10))
    p = np.asarray(r.permutation(50).compute())
    assert sorted(p.tolist()) == list(range(50))


def test_multivariate_normal():
    mean = np.array([1.0, -2.0])
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    r = da.random.default_rng(5)
    s = np.asarray(r.multivariate_normal(mean, cov, size=(8000,), chunks=2000).compute())
    assert s.shape == (8000, 2)
    np.testing.assert_allclose(s.mean(axis=0), mean, atol=0.1)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.15)


def test_legacy_randomstate():
    rs = da.random.RandomState(42)
    s = np.asarray(rs.standard_normal(size=(1000,), chunks=250).compute())
    assert abs(s.mean()) < 0.15
    u = np.asarray(rs.uniform(0, 1, size=(1000,), chunks=250).compute())
    assert 0 <= u.min() and u.max() <= 1


def test_module_level_functions():
    s = np.asarray(da.random.random((400,), chunks=100).compute())
    assert s.shape == (400,) and 0 <= s.min() and s.max() < 1
    n = np.asarray(da.random.normal(0, 1, size=(400,), chunks=100).compute())
    assert abs(n.mean()) < 0.3
