"""U-NSGA-III optimizer unit tests on analytic benchmarks.

Validates the from-scratch NSGA-III machinery (workflows/optimization/
nsga3.py) that replaces the reference's DEAP dependency: non-dominated
sorting, reference-point niching, and convergence on DTLZ2 (the
standard many-objective benchmark whose Pareto front is the unit
sphere octant) and on a separable single-objective bowl (the U- variant
must degrade gracefully to a plain niched GA).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "workflows", "optimization"))

import nsga3  # noqa: E402


def test_non_dominated_sort():
    F = np.array([[0.0, 1.0], [1.0, 0.0], [0.5, 0.5],
                  [1.0, 1.0], [2.0, 2.0]])
    fronts = nsga3.non_dominated_sort(F)
    assert sorted(fronts[0].tolist()) == [0, 1, 2]
    assert fronts[1].tolist() == [3]
    assert fronts[2].tolist() == [4]


def test_das_dennis():
    pts = nsga3.das_dennis_points(3, 4)
    assert pts.shape == (15, 3)
    np.testing.assert_allclose(pts.sum(axis=1), 1.0)


def dtlz2(X, n_obj=3):
    """DTLZ2: front at g=0, i.e. x[k:] = 0.5, |f| = 1."""
    k = n_obj - 1
    g = np.sum((X[:, k:] - 0.5) ** 2, axis=1)
    F = np.ones((len(X), n_obj)) * (1 + g)[:, None]
    theta = X[:, :k] * np.pi / 2
    for i in range(n_obj):
        for j in range(n_obj - 1 - i):
            F[:, i] *= np.cos(theta[:, j])
        if i > 0:
            F[:, i] *= np.sin(theta[:, n_obj - 1 - i])
    return F


def test_dtlz2_convergence():
    ndim, n_obj = 7, 3
    res = nsga3.optimize(lambda X: dtlz2(X, n_obj),
                         np.zeros(ndim), np.ones(ndim), n_obj,
                         pop_size=92, n_gen=60, seed=3)
    # front points should lie near the unit sphere (g ~ 0)
    radii = np.linalg.norm(res.front_f, axis=1)
    assert np.median(radii) < 1.05, np.median(radii)
    # and cover the octant: every objective reaches near its extremes
    assert res.front_f.min() < 0.1
    assert res.front_f.max() > 0.9
    # first front should fill most of the population
    assert len(res.front_x) > 40


def test_single_objective_unsga3():
    """U-NSGA-III with n_obj=1 minimizes a shifted bowl."""
    target = np.array([0.3, -0.2, 0.7])

    def f(X):
        return np.sum((X - target) ** 2, axis=1, keepdims=True)

    res = nsga3.optimize(f, [-1, -1, -1], [1, 1, 1], 1, pop_size=24,
                         n_gen=40, seed=1)
    best = res.x[np.argmin(res.f[:, 0])]
    assert np.linalg.norm(best - target) < 0.05
    assert res.f.min() < 1e-3


def test_environmental_selection_niching():
    """With more first-front points than slots, selection spreads across
    reference directions instead of crowding one corner."""
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, np.pi / 2, 40)
    F = np.stack([np.cos(theta), np.sin(theta)], axis=1)  # 2-obj front
    refs = nsga3.das_dennis_points(2, 6)
    keep, fronts = nsga3.environmental_selection(F, refs, 7, rng)
    assert len(keep) == 7
    kept_theta = np.sort(theta[keep])
    # niched picks should span the quarter circle, not cluster
    assert kept_theta[0] < 0.35
    assert kept_theta[-1] > np.pi / 2 - 0.35
    assert np.max(np.diff(kept_theta)) < 0.75
