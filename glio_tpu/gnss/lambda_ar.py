"""LAMBDA / MLAMBDA integer ambiguity resolution.

Counterpart of the reference's ``RTKLIB/src/lambda.c`` (exercised by its
manual smoke node ``global_fusion/src/testRTKLIBNode.cpp``) — a fresh
implementation of the MLAMBDA method (LᵀDL decorrelation + depth-first
integer least-squares search; Chang, Yang & Zhou 2005), validated against
brute-force enumeration in the tests rather than ported.

Host-side numpy by design: the search is an inherently sequential integer
tree walk over a handful of ambiguities per epoch — not a tensor op; it
runs once per epoch on the float filter's output (``rtk.float_filter``),
off the jit path, exactly as RTKLIB calls ``lambda()`` from ``resamb``.

``resolve_epoch`` additionally applies the conditional (fixed) position
update p_fix = p − P_pa Q_a⁻¹ (a − ǎ) and the standard ratio test.
"""

from typing import NamedTuple, Optional, Tuple

import numpy as np


def ldl(Q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Factor Q = Lᵀ · diag(d) · L with L unit lower triangular."""
    n = Q.shape[0]
    A = Q.copy().astype(float)
    L = np.zeros((n, n))
    d = np.zeros(n)
    for i in range(n - 1, -1, -1):
        d[i] = A[i, i]
        if d[i] <= 0.0:
            raise np.linalg.LinAlgError("Q not positive definite")
        L[i, : i + 1] = A[i, : i + 1] / np.sqrt(d[i])
        for j in range(i):
            A[j, : j + 1] -= L[i, : j + 1] * L[i, j]
        L[i, : i + 1] /= L[i, i]
    return L, d


def reduction(L: np.ndarray, d: np.ndarray):
    """Decorrelating Z-transform (integer Gauss moves + permutations).

    Returns (L', d', Z) with Q_z = Zᵀ Q Z better conditioned for search.
    """
    n = d.shape[0]
    L = L.copy()
    d = d.copy()
    Z = np.eye(n)

    def gauss(i, j):
        mu = round(L[i, j])
        if mu != 0:
            L[i:, j] -= mu * L[i:, i]
            Z[:, j] -= mu * Z[:, i]

    j = n - 2
    k = n - 2
    while j >= 0:
        if j <= k:
            for i in range(j + 1, n):
                gauss(i, j)
        delta = d[j] + L[j + 1, j] ** 2 * d[j + 1]
        if delta + 1e-6 < d[j + 1]:
            eta = d[j] / delta
            lam = d[j + 1] * L[j + 1, j] / delta
            d[j] = eta * d[j + 1]
            d[j + 1] = delta
            B = np.array([[-L[j + 1, j], 1.0], [eta, lam]])
            L[j:j + 2, :j] = B @ L[j:j + 2, :j]
            L[j + 1, j] = lam
            # Swap columns j, j+1 below the 2x2 block and in Z.
            L[j + 2:, [j, j + 1]] = L[j + 2:, [j + 1, j]]
            Z[:, [j, j + 1]] = Z[:, [j + 1, j]]
            k = j
            j = n - 2
        else:
            j -= 1
    return L, d, Z


def search(L: np.ndarray, d: np.ndarray, zs: np.ndarray, m: int = 2,
           max_iter: int = 10000):
    """Depth-first integer least-squares: the m best integer vectors
    minimizing (z − zs)ᵀ Q_z⁻¹ (z − zs), plus their quadratic values."""
    n = d.shape[0]

    def sgn(x):
        return -1.0 if x <= 0.0 else 1.0

    S = np.zeros((n, n))
    dist = np.zeros(n)
    zb = np.zeros(n)
    z = np.zeros(n)
    step = np.zeros(n)
    zn = np.zeros((m, n))
    s = np.zeros(m)

    k = n - 1
    zb[k] = zs[k]
    z[k] = round(zb[k])
    y = zb[k] - z[k]
    step[k] = sgn(y)
    maxdist = 1e99
    nn = 0
    imax = 0
    for _ in range(max_iter):
        newdist = dist[k] + y * y / d[k]
        if newdist < maxdist:
            if k != 0:
                k -= 1
                dist[k] = newdist
                S[k, :k + 1] = (S[k + 1, :k + 1]
                                + (z[k + 1] - zb[k + 1]) * L[k + 1, :k + 1])
                zb[k] = zs[k] + S[k, k]
                z[k] = round(zb[k])
                y = zb[k] - z[k]
                step[k] = sgn(y)
            else:
                if nn < m:
                    if nn == 0 or newdist > s[imax]:
                        imax = nn
                    zn[nn] = z
                    s[nn] = newdist
                    nn += 1
                else:
                    if newdist < s[imax]:
                        zn[imax] = z
                        s[imax] = newdist
                        imax = int(np.argmax(s))
                    maxdist = s[imax]
                z[0] += step[0]
                y = zb[0] - z[0]
                step[0] = -step[0] - sgn(step[0])
        else:
            if k == n - 1:
                break
            k += 1
            z[k] += step[k]
            y = zb[k] - z[k]
            step[k] = -step[k] - sgn(step[k])
    order = np.argsort(s[:nn])
    return zn[order].astype(np.int64), s[order]


def lambda_ar(a: np.ndarray, Q: np.ndarray, ncands: int = 2):
    """MLAMBDA: float ambiguities + covariance → integer candidates.

    Returns (cands (ncands, n) int, sq (ncands,) quadratic values) —
    empty arrays when the factorization fails (singular Q)."""
    try:
        L, d = ldl(np.asarray(Q, float))
    except np.linalg.LinAlgError:
        return np.zeros((0, len(a)), np.int64), np.zeros(0)
    L, d, Z = reduction(L, d)
    zs = Z.T @ np.asarray(a, float)
    zc, sq = search(L, d, zs, m=ncands)
    if zc.shape[0] == 0:
        return zc, sq
    # Back-transform: a = Z⁻ᵀ z (Z is unimodular).
    Zt_inv = np.linalg.inv(Z.T)
    cands = np.rint(Zt_inv @ zc.T).T.astype(np.int64)
    return cands, sq


class FixResult(NamedTuple):
    pos_fixed: np.ndarray     # (3,) conditional fixed position
    amb_fixed: np.ndarray     # (n_dd,) integer DD ambiguities (cycles)
    ratio: float              # s2/s1 ratio-test statistic
    fixed: bool               # ratio test passed


def resolve_epoch(pos: np.ndarray, amb_sd: np.ndarray,
                  amb_cov_sd: np.ndarray, pa_cov: np.ndarray,
                  pair_idx: np.ndarray, master_idx: np.ndarray,
                  wavelength, ratio_thresh: float = 3.0,
                  min_dd: int = 4, max_dd: int = 12) -> Optional[FixResult]:
    """Fix one epoch from the float filter's state.

    Args:
      pos, amb_sd, amb_cov_sd, pa_cov: float solution blocks (SD
        ambiguities in metres, slot space).
      pair_idx, master_idx: (n_dd,) slot indices forming DD pairs
        (non-master, master-of), carrier-valid only.
      wavelength: carrier wavelength(s) (m) to convert to cycles —
        scalar, or (n_dd,) per pair (GPS L1 vs BDS B1 differ by ~1%,
        which is ~1 cycle past |a| ≈ 55 cycles; FDMA pairs whose two
        satellites have different λ are not integer in any common unit
        and must not be passed here).

    Returns None when the problem is degenerate (too few pairs). The
    ratio test s₂/s₁ ≥ thresh gates the fix (RTKLIB default 3.0).
    """
    n = len(pair_idx)
    if n < min_dd:
        return None
    lam = np.broadcast_to(np.asarray(wavelength, float), (n,)).copy()
    if n > max_dd:
        # Keep the best-determined pairs (smallest variance) — bounded
        # search cost, like RTKLIB's partial fixing.
        var = np.array([amb_cov_sd[i, i] for i in pair_idx])
        keep = np.argsort(var)[:max_dd]
        pair_idx = np.asarray(pair_idx)[keep]
        master_idx = np.asarray(master_idx)[keep]
        lam = lam[keep]
        n = max_dd
    D = np.zeros((n, amb_sd.shape[0]))
    D[np.arange(n), pair_idx] = 1.0
    D[np.arange(n), master_idx] -= 1.0
    a_dd = (D @ amb_sd) / lam
    Q_dd = (D @ amb_cov_sd @ D.T) / np.outer(lam, lam)
    Q_dd = 0.5 * (Q_dd + Q_dd.T) + 1e-12 * np.eye(n)
    cands, sq = lambda_ar(a_dd, Q_dd)
    if cands.shape[0] < 2:
        return None
    ratio = float(sq[1] / max(sq[0], 1e-12))
    a_fix = cands[0]
    # Conditional update: p̌ = p − P_pa Dᵀ diag(1/λ) Q_dd⁻¹ (a − ǎ).
    try:
        w = np.linalg.solve(Q_dd, a_dd - a_fix)
    except np.linalg.LinAlgError:
        return None
    pos_fixed = pos - (pa_cov @ D.T / lam[None, :]) @ w
    return FixResult(pos_fixed=pos_fixed, amb_fixed=a_fix, ratio=ratio,
                     fixed=ratio >= ratio_thresh)


# Per-constellation L1-band wavelengths (m); GLONASS is FDMA —
# per-satellite λ — so its pairs are excluded from integer resolution.
SYS_LAMBDA = {0: 299792458.0 / 1.57542e9,    # GPS L1
              2: 299792458.0 / 1.57542e9,    # GAL E1
              3: 299792458.0 / 1.561098e9}   # BDS B1
SYS_GLO = 1


def resolve_trajectory(gnss, flt, wavelength=None, ratio_thresh: float = 3.0):
    """Run the ratio-tested fix over every filter epoch.

    Args:
      gnss: GnssEpochs (for pair structure / carrier validity).
      flt: FloatFilterOut from ``rtk.float_filter``.
      wavelength: scalar λ override (tests/single-constellation sims);
        default None uses the per-constellation SYS_LAMBDA table and
        skips GLONASS (FDMA) pairs.

    Returns (pos (E, 3) — fixed where possible else float, fixed (E,)
    bool, ratio (E,)).
    """
    E, M = np.asarray(gnss.valid).shape
    pos = np.array(flt.pos)
    fixed = np.zeros(E, bool)
    ratio = np.zeros(E)
    valid = np.asarray(gnss.valid)
    car_ok = (np.asarray(gnss.car_valid)
              if gnss.car_valid is not None else np.zeros((E, M), bool))
    system = np.asarray(gnss.system)
    master = np.asarray(gnss.master)
    amb = np.asarray(flt.amb)
    amb_cov = np.asarray(flt.amb_cov)
    pa_cov = np.asarray(flt.pa_cov)
    ok = np.asarray(flt.ok)
    for k in range(E):
        if not ok[k]:
            continue
        pairs, masters, lams = [], [], []
        for s in range(master.shape[1]):
            mp = master[k, s]
            if mp < 0 or not car_ok[k, mp]:
                continue
            if s == SYS_GLO:
                # FDMA: inter-satellite DD ambiguities are non-integer
                # for ANY single wavelength — skip even under a scalar
                # override (a caller's λ is for CDMA sims; feeding
                # GLONASS pairs through the integer search would poison
                # the fix silently — ADVICE r2).
                continue
            lam_s = (wavelength if wavelength is not None
                     else SYS_LAMBDA.get(s))
            if lam_s is None:
                continue
            for m in range(M):
                if (m != mp and valid[k, m] and car_ok[k, m]
                        and system[k, m] == s):
                    pairs.append(m)
                    masters.append(mp)
                    lams.append(lam_s)
        res = resolve_epoch(pos[k], amb[k], amb_cov[k], pa_cov[k],
                            np.asarray(pairs, int),
                            np.asarray(masters, int),
                            np.asarray(lams, float), ratio_thresh)
        if res is not None and res.fixed:
            pos[k] = res.pos_fixed
            fixed[k] = True
            ratio[k] = res.ratio
        elif res is not None:
            ratio[k] = res.ratio
    return pos, fixed, ratio
