"""U-NSGA-III multi-objective evolutionary optimizer (pure numpy).

Self-contained reimplementation of the algorithm used by the reference's
parameter-fitting workflow (/root/reference/workflows/optimization/
ExaConstit_NSGA3.py, which drives DEAP's NSGA-III):

* Das-Dennis structured reference points on the unit simplex
* fast non-dominated sorting
* reference-point (niching) environmental selection  [Deb & Jain 2014]
* SBX crossover + polynomial mutation with box bounds
* U-NSGA-III unified niched tournament mating selection [Seada & Deb
  2015] — reduces to single-objective niching when n_obj == 1, which is
  what makes the "U" variant usable for scalar fits.

No external dependencies (DEAP is not available in this environment);
the evaluation function is supplied by the caller (see
fit_params_moo.py for the crystal-plasticity objective).
"""

from __future__ import annotations

import dataclasses
import math
from itertools import combinations_with_replacement

import numpy as np


# ----------------------------------------------------------------------------
# reference points
# ----------------------------------------------------------------------------

def das_dennis_points(n_obj: int, p: int) -> np.ndarray:
    """Structured reference points with p divisions on the unit simplex."""
    pts = []
    for c in combinations_with_replacement(range(n_obj), p):
        counts = np.bincount(c, minlength=n_obj)
        pts.append(counts / p)
    return np.unique(np.asarray(pts, dtype=float), axis=0)


def default_partitions(n_obj: int, pop_target: int) -> int:
    """Largest p whose point count stays <= pop_target (>= 1)."""
    p = 1
    while True:
        n = math.comb(n_obj + p, p)
        if n > pop_target and p > 1:
            return p - 1
        if n >= pop_target:
            return p
        p += 1


# ----------------------------------------------------------------------------
# non-dominated sorting
# ----------------------------------------------------------------------------

def non_dominated_sort(F: np.ndarray) -> list[np.ndarray]:
    """Indices of each Pareto front (F: (n, m), minimization)."""
    n = F.shape[0]
    # a dominates b: all <= and any <
    le = np.all(F[:, None, :] <= F[None, :, :], axis=2)
    lt = np.any(F[:, None, :] < F[None, :, :], axis=2)
    dom = le & lt  # dom[a, b] = a dominates b
    n_dom = dom.sum(axis=0)  # how many dominate each
    fronts = []
    remaining = np.arange(n)
    counts = n_dom.copy()
    while remaining.size:
        cur = remaining[counts[remaining] == 0]
        if cur.size == 0:  # numerical safety (duplicates)
            cur = remaining
        fronts.append(cur)
        for a in cur:
            counts[dom[a]] -= 1
        remaining = np.setdiff1d(remaining, cur, assume_unique=False)
    return fronts


# ----------------------------------------------------------------------------
# NSGA-III environmental selection
# ----------------------------------------------------------------------------

def _normalize(F: np.ndarray, ideal: np.ndarray) -> np.ndarray:
    """Objective normalization by ideal point + extreme-point intercepts."""
    Fs = F - ideal
    m = F.shape[1]
    # extreme points via achievement scalarizing (axis weights)
    intercepts = np.ones(m)
    try:
        extremes = []
        for j in range(m):
            w = np.full(m, 1e-6)
            w[j] = 1.0
            extremes.append(Fs[np.argmin(np.max(Fs / w, axis=1))])
        E = np.asarray(extremes)
        b = np.linalg.solve(E, np.ones(m))
        intercepts = 1.0 / np.maximum(b, 1e-12)
        if not np.all(np.isfinite(intercepts)):
            raise np.linalg.LinAlgError
    except np.linalg.LinAlgError:
        intercepts = np.maximum(Fs.max(axis=0), 1e-12)
    return Fs / np.maximum(intercepts, 1e-12)


def _associate(Fn: np.ndarray, refs: np.ndarray):
    """(ref index, perpendicular distance) for each normalized point."""
    w = refs / np.linalg.norm(refs, axis=1, keepdims=True)  # (R, m)
    proj = Fn @ w.T  # (n, R)
    d2 = np.sum(Fn * Fn, axis=1)[:, None] - proj ** 2
    dist = np.sqrt(np.maximum(d2, 0.0))
    ref_idx = np.argmin(dist, axis=1)
    return ref_idx, dist[np.arange(len(Fn)), ref_idx]


def environmental_selection(F: np.ndarray, refs: np.ndarray, k: int,
                            rng: np.random.Generator):
    """Pick k survivors from F (NSGA-III niching). Returns indices."""
    fronts = non_dominated_sort(F)
    chosen: list[int] = []
    last = None
    for fr in fronts:
        if len(chosen) + len(fr) <= k:
            chosen.extend(fr.tolist())
            if len(chosen) == k:
                return np.asarray(chosen), fronts
        else:
            last = fr
            break
    if last is None:
        return np.asarray(chosen[:k]), fronts

    ideal = F.min(axis=0)
    pool = np.asarray(chosen + last.tolist())
    Fn = _normalize(F[pool], ideal)
    ref_idx, dist = _associate(Fn, refs)
    n_chosen = len(chosen)
    niche_count = np.bincount(ref_idx[:n_chosen], minlength=len(refs))
    cand = {i: [] for i in range(len(refs))}
    for local_i in range(n_chosen, len(pool)):
        cand[ref_idx[local_i]].append(local_i)

    while len(chosen) < k:
        open_refs = [r for r in range(len(refs)) if cand[r]]
        if not open_refs:
            left = [i for i in range(n_chosen, len(pool))
                    if pool[i] not in chosen]
            need = k - len(chosen)
            chosen.extend(pool[left[:need]].tolist())
            break
        counts = np.asarray([niche_count[r] for r in open_refs])
        r = open_refs[rng.choice(np.flatnonzero(counts == counts.min()))]
        members = cand[r]
        if niche_count[r] == 0:  # closest first for an empty niche
            pick = members[int(np.argmin(dist[members]))]
        else:
            pick = members[int(rng.integers(len(members)))]
        members.remove(pick)
        chosen.append(int(pool[pick]))
        niche_count[r] += 1
    return np.asarray(chosen), fronts


# ----------------------------------------------------------------------------
# variation operators
# ----------------------------------------------------------------------------

def sbx_crossover(p1, p2, low, up, eta, prob, rng):
    """Simulated binary crossover (per-gene), bounded."""
    c1, c2 = p1.copy(), p2.copy()
    do = rng.random(len(p1)) < prob
    u = rng.random(len(p1))
    beta = np.where(u <= 0.5, (2 * u) ** (1.0 / (eta + 1)),
                    (1.0 / (2 * (1 - u))) ** (1.0 / (eta + 1)))
    a = 0.5 * ((p1 + p2) - beta * np.abs(p2 - p1))
    b = 0.5 * ((p1 + p2) + beta * np.abs(p2 - p1))
    c1[do] = a[do]
    c2[do] = b[do]
    return np.clip(c1, low, up), np.clip(c2, low, up)


def polynomial_mutation(x, low, up, eta, prob, rng):
    y = x.copy()
    do = rng.random(len(x)) < prob
    if not np.any(do):
        return y
    u = rng.random(len(x))
    span = up - low
    delta = np.where(
        u < 0.5,
        (2 * u) ** (1.0 / (eta + 1)) - 1.0,
        1.0 - (2 * (1 - u)) ** (1.0 / (eta + 1)))
    y[do] = np.clip(x[do] + delta[do] * span[do], low[do], up[do])
    return y


# ----------------------------------------------------------------------------
# U-NSGA-III mating selection + main loop
# ----------------------------------------------------------------------------

def _unified_tournament(rank, ref_idx, dist, rng):
    """U-NSGA-III niched binary tournament: prefer same-niche rank/dist
    comparisons; across niches pick randomly (preserves diversity)."""
    n = len(rank)
    a, b = rng.integers(n), rng.integers(n)
    if ref_idx[a] == ref_idx[b]:
        if rank[a] != rank[b]:
            return a if rank[a] < rank[b] else b
        return a if dist[a] < dist[b] else b
    return a if rng.random() < 0.5 else b


@dataclasses.dataclass
class NSGA3Result:
    x: np.ndarray          # (pop, ndim) final population
    f: np.ndarray          # (pop, nobj)
    front_x: np.ndarray    # first-front decision vectors
    front_f: np.ndarray
    history: list          # per-generation best-sum objective
    n_evals: int


def optimize(evaluate, bounds_low, bounds_up, n_obj, pop_size=None,
             n_gen=50, seed=0, eta_cx=30.0, eta_mut=20.0, cx_prob=1.0,
             mut_prob=None, refs=None, callback=None,
             x0=None) -> NSGA3Result:
    """Run U-NSGA-III.

    evaluate: (pop, ndim) -> (pop, n_obj) batch objective (minimize).
    """
    low = np.asarray(bounds_low, float)
    up = np.asarray(bounds_up, float)
    ndim = len(low)
    rng = np.random.default_rng(seed)
    if refs is None:
        p = default_partitions(n_obj, pop_size or 4 * n_obj + 20)
        refs = das_dennis_points(n_obj, p)
    if pop_size is None:
        pop_size = int(np.ceil(len(refs) / 4) * 4)
    if mut_prob is None:
        mut_prob = 1.0 / ndim

    X = low + rng.random((pop_size, ndim)) * (up - low)
    if x0 is not None:
        x0 = np.atleast_2d(np.asarray(x0, float))
        X[:len(x0)] = np.clip(x0, low, up)
    F = np.atleast_2d(np.asarray(evaluate(X), float))
    n_evals = pop_size
    history = []

    for gen in range(n_gen):
        fronts = non_dominated_sort(F)
        rank = np.empty(len(F), int)
        for r, fr in enumerate(fronts):
            rank[fr] = r
        Fn = _normalize(F, F.min(axis=0))
        ref_idx, dist = _associate(Fn, refs)

        children = []
        while len(children) < pop_size:
            i = _unified_tournament(rank, ref_idx, dist, rng)
            j = _unified_tournament(rank, ref_idx, dist, rng)
            c1, c2 = sbx_crossover(X[i], X[j], low, up, eta_cx, cx_prob,
                                   rng)
            children.append(polynomial_mutation(c1, low, up, eta_mut,
                                                mut_prob, rng))
            if len(children) < pop_size:
                children.append(polynomial_mutation(c2, low, up, eta_mut,
                                                    mut_prob, rng))
        C = np.asarray(children)
        FC = np.atleast_2d(np.asarray(evaluate(C), float))
        n_evals += len(C)

        XA = np.concatenate([X, C])
        FA = np.concatenate([F, FC])
        keep, _ = environmental_selection(FA, refs, pop_size, rng)
        X, F = XA[keep], FA[keep]
        history.append(float(F.sum(axis=1).min()))
        if callback is not None:
            callback(gen, X, F)

    fronts = non_dominated_sort(F)
    ff = fronts[0]
    return NSGA3Result(x=X, f=F, front_x=X[ff], front_f=F[ff],
                       history=history, n_evals=n_evals)
