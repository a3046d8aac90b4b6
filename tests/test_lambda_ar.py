"""LAMBDA / MLAMBDA integer ambiguity resolution tests.

The search is validated against brute-force enumeration (which catches
any detail error in the decorrelation or tree walk), then the full
float-filter → LAMBDA → fixed-solution chain runs on simulated carrier
epochs whose arc ambiguities are exact integer multiples of λ.
"""

import itertools

import numpy as np
import pytest

from glio_tpu.gnss import lambda_ar

pytestmark = [pytest.mark.slow]  # heavy tier (see pyproject)

LAM = 0.19029367


def _rand_spd(n, rng, cond=50.0):
    A = rng.normal(size=(n, n))
    U, _, Vt = np.linalg.svd(A)
    d = np.logspace(0, np.log10(cond), n)
    return (U * d) @ U.T * 0.01


def _brute_force(a, Q, radius=3):
    """Enumerate all integer vectors within `radius` of round(a)."""
    n = len(a)
    Qi = np.linalg.inv(Q)
    base = np.round(a).astype(int)
    best, best_v, second_v = None, np.inf, np.inf
    for off in itertools.product(range(-radius, radius + 1), repeat=n):
        z = base + np.array(off)
        r = z - a
        v = r @ Qi @ r
        if v < best_v:
            second_v = best_v
            best, best_v = z, v
        elif v < second_v:
            second_v = v
    return best, best_v, second_v


def test_ldl_roundtrip():
    rng = np.random.default_rng(0)
    Q = _rand_spd(6, rng)
    L, d = lambda_ar.ldl(Q)
    np.testing.assert_allclose(L @ np.diag(d) @ L.T, Q, atol=1e-12)
    # Unit lower triangular.
    np.testing.assert_allclose(np.diag(L), 1.0)
    assert np.allclose(np.triu(L, 1), 0.0)


def test_decorrelate_properties():
    """M is unimodular integer; Qz = M Q Mᵀ reproduces the returned
    factorization and is size-reduced (all |L[i,j]| ≤ ½)."""
    rng = np.random.default_rng(1)
    Q = _rand_spd(5, rng)
    M, L, d = lambda_ar.decorrelate(Q)
    assert abs(abs(np.linalg.det(M)) - 1.0) < 1e-9
    np.testing.assert_allclose(M - np.rint(M), 0.0, atol=1e-12)
    Qz = M @ Q @ M.T
    np.testing.assert_allclose(L @ np.diag(d) @ L.T, Qz, atol=1e-9)
    assert np.all(np.abs(np.tril(L, -1)) <= 0.5 + 1e-9)
    # No beneficial adjacent swap remains.
    for i in range(len(d) - 1):
        assert d[i + 1] + L[i + 1, i] ** 2 * d[i] >= d[i] * (1 - 1e-6)


@pytest.mark.parametrize("seed", [2, 3, 4, 5, 6])
def test_search_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n = 5
    Q = _rand_spd(n, rng)
    a_true = rng.integers(-40, 40, size=n).astype(float)
    a = a_true + 0.3 * np.linalg.cholesky(Q) @ rng.normal(size=n)
    cands, sq = lambda_ar.lambda_ar(a, Q)
    zb, v1, v2 = _brute_force(a, Q)
    np.testing.assert_array_equal(cands[0], zb)
    assert abs(sq[0] - v1) < 1e-9
    assert abs(sq[1] - v2) < 1e-6


@pytest.mark.parametrize("seed,cond", [(7, 1e4), (8, 1e4), (9, 1e5)])
def test_search_brute_force_ill_conditioned(seed, cond):
    """Highly correlated ambiguities — the regime decorrelation exists
    for; a naive rounding would fail here."""
    rng = np.random.default_rng(seed)
    n = 6
    Q = _rand_spd(n, rng, cond=cond)
    a_true = rng.integers(-30, 30, size=n).astype(float)
    a = a_true + 0.4 * np.linalg.cholesky(Q) @ rng.normal(size=n)
    cands, sq = lambda_ar.lambda_ar(a, Q)
    # The true optimum can sit outside a small box around round(a) in
    # these correlated problems (that is the point of decorrelation):
    # check (1) we beat-or-match the round(a) box optimum, and (2) no
    # integer vector within radius 2 of OUR candidate beats it.
    _, v1, _ = _brute_force(a, Q, radius=2)
    assert sq[0] <= v1 + 1e-8
    Qi = np.linalg.inv(Q)
    r0 = cands[0] - a
    assert abs(sq[0] - r0 @ Qi @ r0) < 1e-8
    best_local = min(
        (cands[0] + np.array(off) - a) @ Qi @ (cands[0] + np.array(off) - a)
        for off in itertools.product(range(-2, 3), repeat=n))
    assert sq[0] <= best_local + 1e-8


def test_fix_recovers_integers_and_tightens_position():
    """Float filter on integer-λ carrier sim → LAMBDA fixes the DD
    ambiguities and the conditional position beats the float solution."""
    import jax.numpy as jnp
    from glio_tpu.data.simulator import simulate_gnss_epochs
    from glio_tpu.gnss import rtk
    from glio_tpu.utils import coords as C

    ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
    STATION = np.array([-2414266.92, 5386768.987, 2407460.031])
    T = 180
    kf_time = np.arange(T) / 3.0
    th = np.linspace(0, 3, T)
    p_true = np.stack([40 * th, 15 * np.sin(th), 0.5 * th], -1)
    g = simulate_gnss_epochs(p_true, kf_time, ANCHOR, STATION,
                             psr_noise=2.0, epoch_stride=3, seed=31,
                             carrier=True, car_noise=0.003,
                             amb_cycles_lambda=LAM)
    gt = np.asarray(C.enu2ecef(jnp.asarray(p_true), jnp.asarray(ANCHOR)))
    gt = gt[np.arange(0, T, 3)]
    flt = rtk.run_float_filter(g, STATION, gt[0] + 5.0)
    pos_fix, fixed, ratio = lambda_ar.resolve_trajectory(
        g, flt, wavelength=LAM)
    tail = slice(len(gt) // 2, None)
    err_float = np.linalg.norm(np.asarray(flt.pos)[tail] - gt[tail],
                               axis=-1)
    err_fix = np.linalg.norm(pos_fix[tail] - gt[tail], axis=-1)
    # Fixes happen on a meaningful share of converged epochs...
    assert fixed[tail].mean() > 0.3, fixed[tail].mean()
    # ...and fixed epochs are centimetre-level, beating the float mean.
    fixed_tail = fixed[tail]
    assert err_fix[fixed_tail].mean() < 0.05, err_fix[fixed_tail].mean()
    assert err_fix[fixed_tail].mean() < 0.7 * err_float[fixed_tail].mean()
