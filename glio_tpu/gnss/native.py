"""ctypes bindings for the native RINEX decoder (native/rinex_fast.cpp).

Falls back transparently to the pure-Python parser when the shared
library hasn't been built (``scripts/build_native.sh``).
"""

import ctypes
import os

import numpy as np

from .rinex import ObsData, ObsEpoch

_LIB = None
_SO = os.path.join(os.path.dirname(__file__), "..", "native",
                   "librinex_fast.so")


def available() -> bool:
    return _load() is not None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.rinex_obs_open.restype = ctypes.c_void_p
    lib.rinex_obs_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.rinex_obs_num_epochs.restype = ctypes.c_long
    lib.rinex_obs_num_epochs.argtypes = [ctypes.c_void_p]
    lib.rinex_obs_num_records.restype = ctypes.c_long
    lib.rinex_obs_num_records.argtypes = [ctypes.c_void_p]
    lib.rinex_obs_approx.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rinex_obs_epochs.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 2
    lib.rinex_obs_records.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 8
    lib.rinex_obs_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def parse_obs_native(path: str, systems: str = "GREC") -> ObsData:
    """Native-decode a RINEX 3 obs file into the same ObsData structure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("librinex_fast.so not built "
                           "(run scripts/build_native.sh)")
    h = lib.rinex_obs_open(path.encode(), systems.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        ne = lib.rinex_obs_num_epochs(h)
        nr = lib.rinex_obs_num_records(h)
        week = np.zeros(ne)
        tow = np.zeros(ne)
        lib.rinex_obs_epochs(h, week.ctypes.data, tow.ctypes.data)
        epoch = np.zeros(nr, np.int32)
        sysc = np.zeros(nr, np.int8)
        prn = np.zeros(nr, np.int32)
        psr = np.zeros(nr)
        car = np.zeros(nr)
        dop = np.zeros(nr)
        snr = np.zeros(nr)
        lli = np.zeros(nr, np.int32)
        lib.rinex_obs_records(
            h, epoch.ctypes.data, sysc.ctypes.data, prn.ctypes.data,
            psr.ctypes.data, car.ctypes.data, dop.ctypes.data,
            snr.ctypes.data, lli.ctypes.data)
        approx = np.zeros(3)
        has_approx = lib.rinex_obs_approx(h, approx.ctypes.data)
    finally:
        lib.rinex_obs_close(h)

    t = 315964800.0 + week * 604800.0 + tow
    out = ObsData(approx_pos=approx if has_approx else None)
    order = np.argsort(epoch, kind="stable")
    epoch_s = epoch[order]
    bounds = np.searchsorted(epoch_s, np.arange(ne + 1))
    for k in range(ne):
        lo, hi = bounds[k], bounds[k + 1]
        if lo == hi:
            continue
        idx = order[lo:hi]
        sats = [f"{chr(sysc[i])}{prn[i]:02d}" for i in idx]
        out.epochs.append(ObsEpoch(
            time=float(t[k]), sats=sats, psr=psr[idx], carrier=car[idx],
            doppler=dop[idx], snr=snr[idx], lli=lli[idx]))
    return out
