"""Geodetic / GNSS coordinate and time conversions (WGS-84).

TPU-first re-implementation of the conversion set the reference estimator
actually calls (24 call sites in ``GLIO/src/Estimator.cpp``), from
``gnss_comm/include/gnss_comm/gnss_utility.hpp:98-303``
(``gpst2time``/``time2gpst``/``geo2ecef``/``ecef2geo``/``ecef2rotation``) and
the equivalents inside ``GLIO/include/utils/gnss_tools.h``.

All functions are pure jnp, float64, broadcast over leading axes.
"""

import jax.numpy as jnp

from . import safe_trig as trig

# WGS-84 constants (as in RTKLIB rtklib.h / gnss_utility.cpp).
RE_WGS84 = 6378137.0            # earth semimajor axis (m)
FE_WGS84 = 1.0 / 298.257223563  # earth flattening
CLIGHT = 299792458.0            # speed of light (m/s)
OMGE = 7.2921151467e-5          # earth angular velocity (rad/s)

GPS_SECS_PER_WEEK = 604800.0
# GPS time epoch 1980-01-06 00:00:00 UTC as unix seconds.
GPS_UNIX_EPOCH = 315964800.0


def llh2ecef(llh):
    """Geodetic [lat, lon, height] (rad, rad, m) → ECEF [x,y,z] (m).

    Mirrors ``geo2ecef`` (gnss_utility.cpp) / ``llh2ecef`` (gnss_tools.h).
    """
    lat, lon, h = llh[..., 0], llh[..., 1], llh[..., 2]
    sl, cl = trig.sin(lat), trig.cos(lat)
    e2 = FE_WGS84 * (2.0 - FE_WGS84)
    v = RE_WGS84 / jnp.sqrt(1.0 - e2 * sl * sl)
    x = (v + h) * cl * trig.cos(lon)
    y = (v + h) * cl * trig.sin(lon)
    z = (v * (1.0 - e2) + h) * sl
    return jnp.stack([x, y, z], axis=-1)


def ecef2llh(xyz, iters: int = 6):
    """ECEF → geodetic [lat, lon, height] (rad, rad, m), fixed-point iteration.

    The reference uses the same iterate-on-latitude scheme (``ecef2geo``);
    a fixed iteration count keeps it jit-friendly (converges to <1e-9 rad in
    ≤5 iterations at Earth-surface heights).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    e2 = FE_WGS84 * (2.0 - FE_WGS84)
    r2 = x * x + y * y
    r = jnp.sqrt(r2)
    lon = trig.arctan2(y, x)
    # Initial lat from spherical approx.
    lat = trig.arctan2(z, r * (1.0 - e2))
    v = jnp.full_like(lat, RE_WGS84)
    for _ in range(iters):
        sl = trig.sin(lat)
        v = RE_WGS84 / jnp.sqrt(1.0 - e2 * sl * sl)
        lat = trig.arctan2(z + v * e2 * sl, r)
    h = r / trig.cos(lat) - v
    # Handle poles (r ≈ 0) gracefully.
    h = jnp.where(r < 1e-3, jnp.abs(z) - RE_WGS84 * jnp.sqrt(1.0 - e2), h)
    return jnp.stack([lat, lon, h], axis=-1)


def ecef2enu_rotmat(ref_llh):
    """Rotation matrix taking ECEF deltas to local ENU at ref [lat,lon,*].

    Matches ``ecef2rotation``/``cal_m2G`` semantics: enu = R @ (ecef − ref).
    """
    lat, lon = ref_llh[..., 0], ref_llh[..., 1]
    sl, cl = trig.sin(lat), trig.cos(lat)
    so, co = trig.sin(lon), trig.cos(lon)
    m = jnp.stack([
        -so, co, jnp.zeros_like(so),
        -sl * co, -sl * so, cl,
        cl * co, cl * so, sl,
    ], axis=-1)
    return m.reshape(ref_llh.shape[:-1] + (3, 3))


def ecef2enu(xyz, ref_ecef):
    """ECEF point(s) → ENU relative to ECEF reference point."""
    ref_llh = ecef2llh(ref_ecef)
    R = ecef2enu_rotmat(ref_llh)
    d = xyz - ref_ecef
    return jnp.einsum("...ij,...j->...i", R, d)


def enu2ecef(enu, ref_ecef):
    ref_llh = ecef2llh(ref_ecef)
    R = ecef2enu_rotmat(ref_llh)
    return ref_ecef + jnp.einsum("...ji,...j->...i", R, enu)


# --- GPS time <-> (week, tow) <-> unix seconds -------------------------------

def gpst2unix(week, tow):
    """GPS week + seconds-of-week → unix seconds (GPS timescale, no leap fix).

    Equivalent to ``gpst2time``+``time2sec`` in gnss_utility.cpp. The
    reference applies the GPS-UTC offset (18 s for 2021 datasets) as an
    explicit config ``timeshift`` — we keep the same policy.
    """
    return GPS_UNIX_EPOCH + week * GPS_SECS_PER_WEEK + tow


def unix2gpst(t):
    """Unix seconds (GPS timescale) → (week, tow). Mirrors ``time2gpst``."""
    dt = t - GPS_UNIX_EPOCH
    week = jnp.floor(dt / GPS_SECS_PER_WEEK)
    tow = dt - week * GPS_SECS_PER_WEEK
    return week, tow


def sat_azel(rcv_ecef, sat_ecef):
    """Azimuth/elevation (rad) of satellite(s) from receiver ECEF position."""
    enu = ecef2enu(sat_ecef, jnp.broadcast_to(rcv_ecef, sat_ecef.shape))
    e, n, u = enu[..., 0], enu[..., 1], enu[..., 2]
    rho = jnp.sqrt(e * e + n * n)
    az = trig.arctan2(e, n)
    el = trig.arctan2(u, rho)
    return az, el
