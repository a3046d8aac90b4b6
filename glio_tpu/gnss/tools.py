"""GNSS_Tools parity helpers: PRN/constellation classification, DOP.

Rounds out the ``GNSS_Tools`` surface (``GLIO/include/utils/gnss_tools.h``):
the WLS solver lives in ``gnss.spp``, conversions in ``utils.coords``; here
are the PRN classifiers (``PRNisGPS/GLONASS/Beidou/GAL``,
gnss_tools.h:1116-1175 — the reference packs all constellations into one
PRN number space) and dilution-of-precision computation.
"""

import jax.numpy as jnp
import numpy as np

from ..solver.linalg import spd_solve
from ..utils import coords as C

# The reference's packed PRN ranges (gnss_tools.h:1116-1175).
#   GPS: 1-32, GLONASS: 33-56 & 87-96, BDS: 88-121 & 161-195, GAL: 58-92.
# (The published ranges overlap; we reproduce the check order the reference
# uses: GPS → GLONASS → Beidou → Galileo.)


def prn_is_gps(prn):
    return (prn >= 1) & (prn <= 32)


def prn_is_glonass(prn):
    return ((prn > 32) & (prn <= 56)) | ((prn >= 87) & (prn <= 96))


def prn_is_beidou(prn):
    return ((prn <= 121) & (prn >= 88)) | ((prn <= 195) & (prn >= 161))


def prn_is_gal(prn):
    return (prn >= 58) & (prn <= 92) & ~prn_is_gps(prn) & ~prn_is_glonass(prn)


def classify_prn(prn):
    """Packed PRN → constellation id (0 GPS, 1 GLO, 2 GAL, 3 BDS, −1)."""
    prn = np.asarray(prn)
    out = np.full(prn.shape, -1, np.int8)
    out[np.asarray(prn_is_gal(prn))] = 2
    out[np.asarray(prn_is_beidou(prn))] = 3
    out[np.asarray(prn_is_glonass(prn))] = 1
    out[np.asarray(prn_is_gps(prn))] = 0
    return out


def dop(rcv_ecef, sat_pos, valid):
    """(GDOP, PDOP, HDOP, VDOP) from satellite geometry (ENU frame).

    The capability of the reference's DOP message path
    (nlosExclusion/msg/DOP.msg).
    """
    rcv_ecef = jnp.asarray(rcv_ecef)
    enu = C.ecef2enu(jnp.asarray(sat_pos),
                     jnp.broadcast_to(rcv_ecef, jnp.asarray(sat_pos).shape))
    los = enu / jnp.maximum(
        jnp.linalg.norm(enu, axis=-1, keepdims=True), 1.0)
    ones = jnp.ones(los.shape[:-1] + (1,), los.dtype)
    A = jnp.concatenate([los, ones], axis=-1)
    A = jnp.where(jnp.asarray(valid)[..., None], A, 0.0)
    # Cholesky inverse (f64 LU is unsupported on XLA:TPU).
    Q = spd_solve(A.T @ A + 1e-9 * jnp.eye(4, dtype=A.dtype),
                  jnp.eye(4, dtype=A.dtype))
    d = jnp.diagonal(Q)
    gdop = jnp.sqrt(jnp.sum(d))
    pdop = jnp.sqrt(d[0] + d[1] + d[2])
    hdop = jnp.sqrt(d[0] + d[1])
    vdop = jnp.sqrt(d[2])
    return gdop, pdop, hdop, vdop


def skyplot_coordinates(az, el):
    """Satellite az/el → 2-D skyplot x/y (the nlosExclusion skyplot tool).

    Standard polar projection: radius = 90° − elevation, angle = azimuth.
    """
    az = np.asarray(az)
    el = np.asarray(el)
    r = (np.pi / 2 - el) / (np.pi / 2)
    return r * np.sin(az), r * np.cos(az)
