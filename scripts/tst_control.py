"""TST light-urban control run (VERDICT r4 #2).

The reference ships a second dataset — tst20210517 (light urban,
Tsim Sha Tsui East; `GraphGNSSLibV1.1/global_fusion/launch/
gnss_preprocessor/dataublox_TST20210517.launch`) with TWO rovers
(u-blox m8t GPS+BDS, u-blox f9p GREC) and the HKSC broadcast nav file.
Like Whampoa, the base-station OBS (`hksc137c.21o`) is NOT
redistributed, so the converter synthesizes station pseudoranges at the
published HKSC ECEF (geometry-true, atmosphere-modeled).

This is the control experiment for every "the accuracy floor is
Whampoa deep-urban NLOS" claim: the SAME chain (converter → SPP →
robust code DD → carrier float filter → LAMBDA AR) on cleaner data
must show high gate pass rates and tight SPP/DD/float
cross-consistency, with honest covariances. There is no ground-truth
CSV for TST in the reference; cross-method consistency carries the
evidence (all three solutions are computed from disjoint measurement
combinations: code-only absolute, code-DD relative, carrier-smoothed).

Run: PYTHONPATH=/root/repo python scripts/tst_control.py  (CPU)
Outputs one JSON line per receiver; tests/test_tst_control.py pins the
headline numbers.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from glio_tpu.data.episode import GnssEpochs
from glio_tpu.gnss import lambda_ar, rtk, spp
from glio_tpu.utils import coords as C

DATA = "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/tst20210517"
NAV = f"{DATA}/hksc137c.nav"
# HKSC CORS station (same physical station as the Whampoa set; the
# reference's published ECEF, config_urban_hk.yaml station_x/y/z_).
STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
# Local anchor: the reference's rviz aerial-map datum for this sequence
# (rviz_satellite/launch/demo_TST20210517.gps: lat/lon/alt).
ANCHOR = np.asarray(C.llh2ecef(jnp.asarray(
    [np.deg2rad(22.3011998583), np.deg2rad(114.179057108), 3.471])))

RECEIVERS = {
    "m8t": (f"{DATA}/20210517.light-urban.tste.ublox.m8t.GC.obs", "GC"),
    "f9p": (f"{DATA}/20210517.light-urban.tste.ublox.f9p.obs", "GREC"),
}


def load_gnss(rx: str) -> GnssEpochs:
    cache = f"/tmp/tst_{rx}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return GnssEpochs(**{k: z[k] for k in z.files})
    from glio_tpu.gnss import converter
    path, systems = RECEIVERS[rx]
    g = converter.convert(
        path, NAV, station_ecef=STATION,
        opts=converter.ConvertOptions(systems=systems))
    np.savez_compressed(cache, **{
        k: v for k, v in g.__dict__.items() if v is not None})
    return g


def run_receiver(rx: str, return_solutions: bool = False):
    g = load_gnss(rx)
    E = g.time.shape[0]
    out = {"receiver": rx, "epochs": E,
           "sats_median": float(np.median(g.valid.sum(1)))}

    # --- SPP (per-constellation-clock WLS, gnss_tools.h parity) ---
    pos_spp, clk, ok_spp, rms = jax.vmap(
        lambda sp, pr, sy, va, el, sn: spp.solve_epoch(
            sp, pr, sy, va, el, sn, jnp.asarray(STATION)))(
        jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov_corr),
        jnp.asarray(g.system, jnp.int32), jnp.asarray(g.valid),
        jnp.asarray(g.elevation), jnp.asarray(g.snr))
    pos_spp = np.asarray(pos_spp)
    ok_spp = np.asarray(ok_spp) & (np.asarray(rms) < 30.0)
    out["spp_ok_rate"] = round(float(ok_spp.mean()), 3)

    # --- robust code DD (IRLS Huber 3σ + 30 m NLOS trim) ---
    fixes_dd, covs, oks, ndd = rtk.solve_epochs_dd(
        jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov),
        jnp.asarray(g.psr_sta), jnp.asarray(g.valid),
        jnp.asarray(g.system, jnp.int32), jnp.asarray(g.master),
        jnp.asarray(STATION), jnp.asarray(g.elevation),
        jnp.asarray(g.snr), jnp.asarray(ANCHOR),
        iters=12, huber=3.0, trim=30.0)
    fixes_dd = np.asarray(fixes_dd)
    sig_dd = np.sqrt(np.maximum(
        np.trace(np.asarray(covs), axis1=1, axis2=2) / 3, 1e-6))
    ok_dd = np.asarray(oks) & (sig_dd < 5.0)
    out["dd_gate_rate"] = round(float(ok_dd.mean()), 3)
    out["dd_sigma_med_m"] = round(float(np.median(sig_dd[ok_dd])), 2) \
        if ok_dd.any() else None

    # --- carrier float filter (innovation-gated, honest covariance) ---
    x0 = fixes_dd[np.nonzero(ok_dd)[0][0]] if ok_dd.any() else ANCHOR
    flt = rtk.run_float_filter(g, STATION, x0)
    sig_f = np.sqrt(np.maximum(
        np.trace(np.asarray(flt.pos_cov), axis1=1, axis2=2) / 3, 1e-6))
    ok_f = np.asarray(flt.ok) & (sig_f < 5.0)
    out["float_gate_rate"] = round(float(ok_f.mean()), 3)
    out["float_sigma_med_m"] = round(float(np.median(sig_f[ok_f])), 2) \
        if ok_f.any() else None

    # --- LAMBDA integer ambiguity resolution ---
    pos_ar, fixed, ratio = lambda_ar.resolve_trajectory(g, flt)
    out["ar_fix_rate"] = round(float(fixed.mean()), 3)
    out["ar_ratio_med"] = round(
        float(np.median(ratio[ratio > 0])), 2) if (ratio > 0).any() else None

    # --- cross-consistency (the no-ground-truth accuracy evidence) ---
    # Median 3D distances between methods over epochs where both pass.
    flt_pos = np.asarray(flt.pos)

    def cross(a, am, b, bm):
        m = am & bm
        if m.sum() < 10:
            return None
        return round(float(np.median(
            np.linalg.norm(a[m] - b[m], axis=1))), 2)

    out["spp_vs_dd_med_m"] = cross(pos_spp, ok_spp, fixes_dd, ok_dd)
    out["dd_vs_float_med_m"] = cross(fixes_dd, ok_dd, flt_pos, ok_f)
    out["spp_vs_float_med_m"] = cross(pos_spp, ok_spp, flt_pos, ok_f)

    # --- covariance honesty: |DD − float| against the combined σ ---
    # (on clean data the discrepancy should be covered: median
    # normalized distance ≲ ~2-3 over the jointly-gated epochs).
    m = ok_dd & ok_f
    if m.sum() >= 10:
        d = np.linalg.norm(fixes_dd[m] - flt_pos[m], axis=1)
        s = np.sqrt(sig_dd[m] ** 2 + sig_f[m] ** 2) * np.sqrt(3.0)
        out["dd_float_norm_med"] = round(float(np.median(d / s)), 2)
    if return_solutions:
        return out, {"time": g.time, "dd": fixes_dd, "dd_ok": ok_dd,
                     "flt": flt_pos, "flt_ok": ok_f}
    return out


def cross_receiver(sol_a: dict, sol_b: dict) -> dict:
    """TRUE hardware-independent accuracy check: the m8t and f9p rovers
    recorded the SAME drive simultaneously (652 common epochs), so two
    receivers' solutions must agree to the inter-antenna baseline
    (~1 m) plus their solution errors — no ground-truth CSV needed and
    nothing (hardware, tracking loops, constellations: GC vs GREC) is
    shared between them except the sky."""
    out = {"receiver": "m8t-vs-f9p"}
    ia, ib = [], []
    jb = 0
    for i, t in enumerate(sol_a["time"]):
        while jb < len(sol_b["time"]) - 1 and sol_b["time"][jb] < t - 0.05:
            jb += 1
        if abs(sol_b["time"][jb] - t) <= 0.05:
            ia.append(i)
            ib.append(jb)
    ia, ib = np.asarray(ia), np.asarray(ib)
    out["common_epochs"] = int(len(ia))
    for key, okkey, name in (("dd", "dd_ok", "dd_cross_med_m"),
                             ("flt", "flt_ok", "float_cross_med_m")):
        m = sol_a[okkey][ia] & sol_b[okkey][ib]
        if m.sum() >= 10:
            d = np.linalg.norm(sol_a[key][ia][m] - sol_b[key][ib][m],
                               axis=1)
            out[name] = round(float(np.median(d)), 2)
            out[name.replace("_med_", "_p90_")] = round(
                float(np.percentile(d, 90)), 2)
            out[name.replace("_med_m", "_n")] = int(m.sum())
    return out


def main():
    sols = {}
    for rx in RECEIVERS:
        res, sols[rx] = run_receiver(rx, return_solutions=True)
        print(json.dumps(res))
    print(json.dumps(cross_receiver(sols["m8t"], sols["f9p"])))


if __name__ == "__main__":
    main()
