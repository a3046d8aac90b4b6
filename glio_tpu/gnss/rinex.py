"""RINEX 3 observation / navigation file decoding (host-side).

This is the offline-converter replacement for the RINEX machinery of the
reference's forked RTKLIB (``GraphGNSSLibV1.1/global_fusion/RTKLIB/src/``,
stock 2.4.3 ``rinex.c``) — re-written from the RINEX 3.03 spec, not ported.
Only what the GLIO pipeline consumes is implemented: mixed GPS/BDS/GAL/GLO
L1 observations (C/L/D/S) and broadcast Kepler ephemerides.

Everything returns plain numpy; tensorization happens in
``glio_tpu.gnss.converter``.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

# Constellation ids used throughout the framework.
SYS_GPS, SYS_GLO, SYS_GAL, SYS_BDS = 0, 1, 2, 3
SYS_CHAR = {"G": SYS_GPS, "R": SYS_GLO, "E": SYS_GAL, "C": SYS_BDS}

GPS_DAY0 = 44244  # MJD of 1980-01-06


def civil2mjd(y, m, d):
    """Gregorian calendar date → Modified Julian Day (integer)."""
    if m <= 2:
        y -= 1
        m += 12
    a = y // 100
    b = 2 - a + a // 4
    return int(365.25 * (y + 4716)) + int(30.6001 * (m + 1)) + d + b - 1524 - 2400001


def civil2gps(y, m, d, hh, mm, ss):
    """Civil date/time in GPS timescale → (week, tow)."""
    days = civil2mjd(y, m, d) - GPS_DAY0
    week = days // 7
    tow = (days % 7) * 86400.0 + hh * 3600.0 + mm * 60.0 + ss
    return week, tow


@dataclass
class Ephemeris:
    """Broadcast Kepler ephemeris (GPS / BDS / GAL)."""
    sys: int
    prn: int
    week: int          # GPS week of toe (BDS converted to GPS week)
    toe: float         # seconds of GPS week
    toc: float         # seconds of GPS week (clock reference)
    toes: float = 0.0  # toe seconds-of-week in the system's NATIVE timescale
                       # (BDT for BDS) — the ICD's −ω_e·toe term needs this
    af0: float = 0.0
    af1: float = 0.0
    af2: float = 0.0
    crs: float = 0.0
    delta_n: float = 0.0
    m0: float = 0.0
    cuc: float = 0.0
    e: float = 0.0
    cus: float = 0.0
    sqrt_a: float = 0.0
    cic: float = 0.0
    omega0: float = 0.0
    cis: float = 0.0
    i0: float = 0.0
    crc: float = 0.0
    omega: float = 0.0
    omega_dot: float = 0.0
    idot: float = 0.0
    tgd: float = 0.0
    sva: float = 0.0
    health: float = 0.0


@dataclass
class GloEphemeris:
    """GLONASS broadcast record: PZ-90 state vector + clock model.

    RINEX 3 'R' records carry position/velocity/acceleration (km) at the
    reference epoch plus −τ_n / γ_n; evaluation integrates the ICD motion
    model (RTKLIB ``geph2pos``/``deq``, ephemeris.c — behavior reference
    only)."""
    prn: int
    toe: float          # GPS unix seconds of the reference epoch
    tau_n: float        # −SV clock bias (s): dts = −τ_n + γ_n·(t−toe)
    gamma_n: float      # relative frequency bias
    pos: np.ndarray     # (3,) m, PZ-90 ECEF
    vel: np.ndarray     # (3,) m/s
    acc: np.ndarray     # (3,) m/s² (lunisolar perturbation)
    health: float = 0.0
    freq_num: int = 0   # FDMA channel k: f1 = 1602 MHz + k·562.5 kHz
    sys: int = SYS_GLO


GPS_UTC_LEAP_2021 = 18.0   # GPS − UTC leap seconds (2017-01-01 onward)


@dataclass
class ObsEpoch:
    time: float                        # GPS seconds (unix-referenced)
    sats: List[str]                    # e.g. "G14", "C11"
    psr: np.ndarray                    # (n,) pseudorange (m), nan if absent
    carrier: np.ndarray                # (n,) carrier phase (cycles)
    doppler: np.ndarray                # (n,) doppler (Hz)
    snr: np.ndarray                    # (n,) C/N0 (dB-Hz)
    lli: np.ndarray                    # (n,) loss-of-lock indicator


@dataclass
class ObsData:
    epochs: List[ObsEpoch] = field(default_factory=list)
    approx_pos: Optional[np.ndarray] = None


def _f(s: str) -> float:
    s = s.strip()
    if not s:
        return np.nan
    try:
        return float(s)
    except ValueError:
        return np.nan


def parse_obs(path: str, systems: str = "GREC") -> ObsData:
    """Parse a RINEX 3 observation file.

    Keeps the first pseudorange/carrier/doppler/SNR observable per
    satellite (L1/B1/E1 codes come first in these files, matching the
    reference's L1-only processing, ``gnss_preprocessor.cpp:79`` nf=1).
    """
    obs_types: Dict[str, List[str]] = {}
    out = ObsData()
    with open(path) as fh:
        # ---- header ----
        for line in fh:
            label = line[60:].strip()
            if label == "SYS / # / OBS TYPES":
                sys_c = line[0]
                n = int(line[3:6])
                types = line[7:60].split()
                while len(types) < n:
                    cont = next(fh)
                    types += cont[7:60].split()
                obs_types[sys_c] = types
            elif label == "APPROX POSITION XYZ":
                out.approx_pos = np.array(
                    [_f(line[0:14]), _f(line[14:28]), _f(line[28:42])])
            elif label == "END OF HEADER":
                break

        # Column picks per system: first C*, L*, D*, S* observables.
        picks = {}
        for sys_c, types in obs_types.items():
            def first(prefix):
                for i, t in enumerate(types):
                    if t.startswith(prefix):
                        return i
                return None
            picks[sys_c] = (first("C"), first("L"), first("D"), first("S"))

        # ---- body ----
        for line in fh:
            if not line.startswith(">"):
                continue
            y = int(line[2:6]); mo = int(line[7:9]); dd = int(line[10:12])
            hh = int(line[13:15]); mi = int(line[16:18]); ss = float(line[18:29])
            flag = int(line[31:32])
            nsat = int(line[32:35])
            week, tow = civil2gps(y, mo, dd, hh, mi, ss)
            t = 315964800.0 + week * 604800.0 + tow
            sats, psr, car, dop, snr, lli = [], [], [], [], [], []
            for _ in range(nsat):
                rec = next(fh).rstrip("\n")
                sat = rec[0:3].replace(" ", "0")
                sys_c = sat[0]
                if sys_c not in picks or sys_c not in systems:
                    continue
                pc, pl, pd, ps = picks[sys_c]

                def val(col):
                    if col is None:
                        return np.nan, 0
                    start = 3 + 16 * col
                    fld = rec[start:start + 14]
                    l = rec[start + 14:start + 15].strip()
                    return _f(fld), int(l) if l else 0

                p, _ = val(pc)
                c, li = val(pl)
                d, _ = val(pd)
                s, _ = val(ps)
                if np.isnan(p):
                    continue
                sats.append(sat)
                psr.append(p); car.append(c); dop.append(d)
                snr.append(s); lli.append(li)
            if flag == 0 and sats:
                out.epochs.append(ObsEpoch(
                    time=t, sats=sats,
                    psr=np.array(psr), carrier=np.array(car),
                    doppler=np.array(dop), snr=np.array(snr),
                    lli=np.array(lli)))
    return out


# BDT week 0 began at GPS week 1356; BDT = GPST − 14 s.
BDS_WEEK_OFFSET = 1356
BDS_TIME_OFFSET = 14.0


def parse_nav(path: str, glo: Optional[Dict[str, List[GloEphemeris]]] = None,
              skip_kepler: bool = False) -> Dict[str, List[Ephemeris]]:
    """Parse a RINEX 3 navigation file → {sat: [Ephemeris sorted by toe]}.

    GPS/GAL/BDS Kepler records. GLONASS state-vector records are decoded
    into `glo` when a dict is passed (``parse_nav_glo`` wraps this); with
    glo=None they are skipped (the UrbanNav launch runs GPS+BDS L1).
    """
    out: Dict[str, List[Ephemeris]] = {}
    with open(path) as fh:
        for line in fh:
            if line[60:].strip() == "END OF HEADER":
                break
        lines = fh.readlines()

    def fnum(s):
        return _f(s.replace("D", "E").replace("d", "e"))

    i = 0
    while i < len(lines):
        line = lines[i]
        sat = line[0:3].replace(" ", "0")
        sys_c = sat[0]
        if sys_c == "R":           # GLONASS: 4-line state-vector records
            if glo is None:
                i += 4
                continue
            try:
                y = int(line[4:8]); mo = int(line[9:11]); dd = int(line[12:14])
                hh = int(line[15:17]); mi = int(line[18:20]); ss = int(line[21:23])
            except ValueError:
                i += 1
                continue
            vals = [fnum(line[23 + 19 * k: 23 + 19 * (k + 1)])
                    for k in range(3)]
            rows = []
            for k in range(3):
                l2 = lines[i + 1 + k]
                rows.append([fnum(l2[4 + 19 * j: 4 + 19 * (j + 1)])
                             for j in range(4)])
            i += 4
            # Epoch is UTC; GLONASS clock applies at UTC(SU) — convert the
            # record epoch to the GPS timescale used throughout.
            week, tow = civil2gps(y, mo, dd, hh, mi, ss)
            toe = 315964800.0 + week * 604800.0 + tow + GPS_UTC_LEAP_2021
            geph = GloEphemeris(
                prn=int(sat[1:3]), toe=toe,
                tau_n=-vals[0], gamma_n=vals[1],
                pos=np.array([rows[0][0], rows[1][0], rows[2][0]]) * 1e3,
                vel=np.array([rows[0][1], rows[1][1], rows[2][1]]) * 1e3,
                acc=np.array([rows[0][2], rows[1][2], rows[2][2]]) * 1e3,
                health=rows[0][3], freq_num=int(rows[1][3]))
            glo.setdefault(sat, []).append(geph)
            continue
        if sys_c not in ("G", "C", "E"):
            i += 1
            continue
        if skip_kepler:          # GLONASS-only pass (parse_nav_glo)
            i += 8
            continue
        try:
            y = int(line[4:8]); mo = int(line[9:11]); dd = int(line[12:14])
            hh = int(line[15:17]); mi = int(line[18:20]); ss = int(line[21:23])
        except ValueError:
            i += 1
            continue
        vals = [fnum(line[23 + 19 * k: 23 + 19 * (k + 1)]) for k in range(3)]
        body = []
        for k in range(7):
            l2 = lines[i + 1 + k]
            body += [fnum(l2[4 + 19 * j: 4 + 19 * (j + 1)]) for j in range(4)]
        i += 8

        # body[] layout (7 data lines × 4 fields):
        #  0:IODE 1:Crs 2:Δn 3:M0 | 4:Cuc 5:e 6:Cus 7:√A |
        #  8:Toe 9:Cic 10:Ω0 11:Cis | 12:i0 13:Crc 14:ω 15:Ω̇ |
        # 16:IDOT 17:codes 18:week 19:flag | 20:sva 21:health 22:TGD 23:IODC
        week_field = body[18]      # GPS week (GPS/GAL) or BDT week (BDS)
        toe = body[8]
        toes = body[8]             # native-timescale seconds of week
        toc_week, toc_tow = civil2gps(y, mo, dd, hh, mi, ss)
        if sys_c == "C":
            # Times in the file are BDT; convert to GPS timescale.
            week = int(week_field) + BDS_WEEK_OFFSET
            toe = toe + BDS_TIME_OFFSET
            toc_tow = toc_tow  # toc date is already given in BDT civil time
            # Convert the civil toc (BDT) to GPS by adding the 14 s offset.
            toc_tow += BDS_TIME_OFFSET
            # Guard week rollover from the +14 s.
            if toc_tow >= 604800.0:
                toc_tow -= 604800.0
                toc_week += 1
        else:
            week = int(week_field)
        eph = Ephemeris(
            sys=SYS_CHAR[sys_c], prn=int(sat[1:3]), week=week, toe=toe,
            toes=toes,
            toc=toc_week * 604800.0 + toc_tow - week * 604800.0,
            af0=vals[0], af1=vals[1], af2=vals[2],
            crs=body[1], delta_n=body[2], m0=body[3],
            cuc=body[4], e=body[5], cus=body[6], sqrt_a=body[7],
            cic=body[9], omega0=body[10], cis=body[11],
            i0=body[12], crc=body[13], omega=body[14], omega_dot=body[15],
            idot=body[16], sva=body[20], health=body[21], tgd=body[22],
        )
        out.setdefault(sat, []).append(eph)

    for sat in out:
        out[sat].sort(key=lambda e: e.week * 604800.0 + e.toe)
    return out


def parse_nav_glo(path: str) -> Dict[str, List[GloEphemeris]]:
    """GLONASS records of a RINEX 3 nav file → {sat: [GloEphemeris]}."""
    glo: Dict[str, List[GloEphemeris]] = {}
    parse_nav(path, glo=glo, skip_kepler=True)
    for sat in glo:
        glo[sat].sort(key=lambda e: e.toe)
    return glo


def select_geph(gephs: List[GloEphemeris], t_gps: float,
                max_age: float = 1800.0) -> Optional[GloEphemeris]:
    """Nearest healthy GLONASS record within the 30-min fit interval."""
    best, best_dt = None, np.inf
    for e in gephs:
        if e.health != 0:
            continue
        dt = abs(t_gps - e.toe)
        if dt < best_dt:
            best, best_dt = e, dt
    return best if best is not None and best_dt <= max_age else None


def select_eph(ephs: List[Ephemeris], t_gps: float) -> Optional[Ephemeris]:
    """Pick the ephemeris whose toe is nearest to t (within fit interval)."""
    best, best_dt = None, np.inf
    for e in ephs:
        dt = abs(t_gps - (315964800.0 + e.week * 604800.0 + e.toe))
        if dt < best_dt:
            best, best_dt = e, dt
    max_age = 3700.0 * 2 if (best and best.sys == SYS_BDS) else 7200.0 * 2
    if best is not None and best_dt > max_age:
        return None
    return best
