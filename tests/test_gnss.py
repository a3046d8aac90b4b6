"""GNSS stack tests: RINEX decode, ephemeris, SPP on real UrbanNav data,
DD formation and factors.

The real Whampoa RINEX files shipped with the reference
(`GraphGNSSLibV1.1/global_fusion/dataset/`) serve as fixtures; SPP
solutions are validated against the golden trajectory's bounding box
(`/root/reference/result/tc_sw_result.csv`).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from glio_tpu.factors import gnss as gnss_factors
from glio_tpu.gnss import converter, dd, ephemeris, rinex, spp
from glio_tpu.utils import coords as C

DATA = "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/urbannavWhampoa"
OBS = f"{DATA}/20210521.medium-urban.whampoa.ublox.m8t.GC.obs"
NAV = f"{DATA}/hksc141g.nav"
STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
have_data = os.path.exists(OBS)

pytestmark = [pytest.mark.slow, pytest.mark.real_data,
              pytest.mark.skipif(not have_data,
                                 reason="reference dataset absent")]


@pytest.fixture(scope="module")
def epochs():
    return converter.convert(
        OBS, NAV, station_ecef=STATION,
        opts=converter.ConvertOptions(max_epochs=60))


class TestRinex:
    def test_obs_header_and_first_epoch(self):
        obs = rinex.parse_obs(OBS)
        np.testing.assert_allclose(
            obs.approx_pos, [-2418136.8695, 5385860.7891, 2405565.9777])
        ep = obs.epochs[0]
        # First epoch 2021-05-21 06:29:06.001 GPS; G14 psr 20618900.381.
        week, tow = rinex.civil2gps(2021, 5, 21, 6, 29, 6.001)
        assert week == 2158
        np.testing.assert_allclose(tow, 455346.001, atol=1e-6)
        i = ep.sats.index("G14")
        np.testing.assert_allclose(ep.psr[i], 20618900.381)
        np.testing.assert_allclose(ep.doppler[i], -1252.533)
        np.testing.assert_allclose(ep.snr[i], 24.0)

    def test_nav_fields(self):
        nav = rinex.parse_nav(NAV)
        e = nav["C01"][0]
        np.testing.assert_allclose(e.af0, -0.447334023193e-03)
        np.testing.assert_allclose(e.sqrt_a, 0.649353140831e04)
        np.testing.assert_allclose(e.toes, 450000.0)      # native BDT sow
        assert e.week == 802 + rinex.BDS_WEEK_OFFSET

    def test_gps_week_consistency(self):
        nav = rinex.parse_nav(NAV)
        for sat, ephs in nav.items():
            if sat.startswith("G"):
                assert ephs[0].week == 2158
                break


class TestEphemeris:
    def test_orbit_radii(self):
        nav = rinex.parse_nav(NAV)
        t = 315964800.0 + 2158 * 604800.0 + 455400.0
        for sat, lo, hi in [("G14", 2.60e7, 2.67e7), ("C11", 2.76e7, 2.82e7),
                            ("C01", 4.21e7, 4.22e7)]:
            if sat not in nav:
                continue
            e = rinex.select_eph(nav[sat], t)
            pos, _, _, _ = ephemeris.tx_time_sat_state(e, t, 2.2e7)
            r = np.linalg.norm(pos)
            assert lo < r < hi, (sat, r)

    def test_batch_matches_scalar(self):
        nav = rinex.parse_nav(NAV)
        ephs = [nav["G14"][0], nav["C11"][0], nav["C01"][0]]
        P = ephemeris.stack_ephs(ephs)
        t = np.full(3, 315964800.0 + 2158 * 604800.0 + 455400.0)
        psr = np.array([2.06e7, 2.35e7, 3.69e7])
        pos_b, vel_b, clk_b, ddt_b = ephemeris.tx_state_batch(P, t, psr)
        for k, e in enumerate(ephs):
            pos_s, vel_s, clk_s, _ = ephemeris.tx_time_sat_state(e, t[k], psr[k])
            np.testing.assert_allclose(pos_b[k], pos_s, atol=1e-6)
            np.testing.assert_allclose(vel_b[k], vel_s, atol=1e-4)
            np.testing.assert_allclose(clk_b[k], clk_s, atol=1e-15)


class TestSPP:
    def test_positions_match_golden_area(self, epochs):
        g = epochs
        x0 = jnp.asarray([-2418136.8695, 5385860.7891, 2405565.9777])
        pos, clk, ok, rms = spp.solve_epochs(
            jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov_corr),
            jnp.asarray(g.system), jnp.asarray(g.valid),
            jnp.asarray(g.elevation), jnp.asarray(g.snr), x0)
        okn = np.asarray(ok)
        assert okn.sum() >= 55
        llh = np.asarray(C.ecef2llh(pos))[okn]
        lat, lon = np.rad2deg(llh[:, 0]), np.rad2deg(llh[:, 1])
        # Golden trajectory start: 22.30155, 114.19031 — static at start.
        assert np.all(np.abs(lat - 22.3016) < 0.002)
        assert np.all(np.abs(lon - 114.1903) < 0.002)
        assert np.median(np.asarray(rms)[okn]) < 20.0

    def test_gps_bds_agree(self, epochs):
        g = epochs
        x0 = jnp.asarray([-2418136.8695, 5385860.7891, 2405565.9777])
        sols = []
        for sysid in (0, 3):
            v = jnp.asarray(g.valid & (g.system == sysid))
            pos, _, ok, _ = spp.solve_epochs(
                jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov_corr),
                jnp.asarray(g.system), v,
                jnp.asarray(g.elevation), jnp.asarray(g.snr), x0)
            sols.append(np.asarray(pos)[np.asarray(ok)].mean(0))
        # Constellations must agree to tens of metres (no frame bias).
        assert np.linalg.norm(sols[0] - sols[1]) < 60.0


class TestDD:
    def test_master_selection(self):
        el = np.array([0.3, 0.9, 0.5, 0.8, 0.2, 0.0])
        valid = np.array([1, 1, 1, 1, 1, 0], bool)
        system = np.array([0, 0, 0, 3, 3, 3])
        m = dd.select_master(el, valid, system)
        assert m[0] == 1       # highest-elevation GPS
        assert m[3] == -1      # only 2 valid BDS sats → needs > 2
        assert m[1] == -1 and m[2] == -1

    def test_boundary_epoch_binds_to_exactly_one_interval(self):
        """An epoch whose timestamp exactly equals a keyframe time must
        bind to interval k (half-open (t_{k-1}, t_k]), not vanish
        (ADVICE r1: side='left' searchsorted silently dropped it)."""
        from glio_tpu.data.episode import GnssEpochs

        M = 8
        E = 3
        times = np.array([0.5, 1.0, 1.7])  # epoch 1 exactly at kf time 1.0
        g = GnssEpochs(
            time=times,
            sat_pos=np.zeros((E, M, 3)), sat_vel=np.zeros((E, M, 3)),
            sat_ddt=np.zeros((E, M)),
            psr_rov=np.ones((E, M)), psr_sta=np.ones((E, M)),
            psr_rov_corr=np.ones((E, M)), dopp_rov=np.zeros((E, M)),
            elevation=np.full((E, M), 0.8), snr=np.full((E, M), 40.0),
            valid=np.ones((E, M), bool),
            system=np.zeros((E, M), np.int8),
            master=np.zeros((E, 4), np.int32),
        )
        kf_time = np.array([0.0, 1.0, 2.0])
        out = dd.bind_epochs_to_keyframes(g, kf_time, M)
        # Keyframe 1's interval (0, 1] must have picked the epoch at 1.0.
        assert out["gnss_valid"][1]
        assert out["gnss_ratio"][1] == 0.0  # epoch exactly at kf 1
        # Keyframe 2's interval (1, 2] picks the 1.7 epoch (not 1.0 again).
        assert out["gnss_valid"][2]
        assert np.isclose(out["gnss_ratio"][2], (2.0 - 1.7) / 1.0)

    def test_elesnr_var_numpy_twin(self):
        """dd._elesnr_var_np must match spp.elesnr_var (the whitening path
        uses the numpy twin to avoid per-satellite device dispatches)."""
        rng = np.random.default_rng(0)
        el = rng.uniform(0.01, np.pi / 2, 64)
        snr = rng.uniform(5.0, 55.0, 64)
        ours = np.array([dd._elesnr_var_np(e, s) for e, s in zip(el, snr)])
        ref = np.asarray(spp.elesnr_var(jnp.asarray(el), jnp.asarray(snr)))
        np.testing.assert_allclose(ours, ref, rtol=1e-12)

    def test_dd_residual_zero_at_truth(self, epochs):
        """With a synthesized (noise-free) station and the rover at the SPP
        solution, DD residuals should be small (bounded by rover noise)."""
        g = epochs
        k = 0
        x0 = jnp.asarray([-2418136.8695, 5385860.7891, 2405565.9777])
        pos, _, ok, _ = spp.solve_epoch(
            jnp.asarray(g.sat_pos[k]), jnp.asarray(g.psr_rov_corr[k]),
            jnp.asarray(g.system[k]), jnp.asarray(g.valid[k]),
            jnp.asarray(g.elevation[k]), jnp.asarray(g.snr[k]), x0)
        W = dd.dd_whitening_matrix(
            g.elevation[k], g.snr[k], g.valid[k], g.system[k],
            g.master[k], g.sat_pos.shape[1])
        r = dd.dd_residual(
            pos, jnp.asarray(g.sat_pos[k]), jnp.asarray(g.psr_rov[k]),
            jnp.asarray(g.psr_sta[k]), jnp.asarray(STATION),
            jnp.asarray(g.valid[k]), jnp.asarray(g.system[k]),
            jnp.asarray(g.master[k]), jnp.asarray(W))
        r = np.asarray(r)
        assert np.isfinite(r).all()
        # Whitened residuals at the SPP fix: noise-level, not km-level.
        assert np.abs(r).max() < 50.0
        assert np.abs(r).max() > 0.0   # actually engaged

    def test_dd_factor_sensitivity(self, epochs):
        """Moving the local pose moves the DD residual (nonzero Jacobian)."""
        import jax
        g = epochs
        k = 0
        anchor = jnp.asarray(STATION * 1.0)
        W = jnp.asarray(dd.dd_whitening_matrix(
            g.elevation[k], g.snr[k], g.valid[k], g.system[k],
            g.master[k], g.sat_pos.shape[1]))

        def f(p):
            r = gnss_factors.dd_psr_residual(
                p, p, 0.5, anchor, jnp.asarray(0.0), jnp.asarray(STATION),
                jnp.asarray(g.sat_pos[k]), jnp.asarray(g.psr_rov[k]),
                jnp.asarray(g.psr_sta[k]), jnp.asarray(g.valid[k]),
                jnp.asarray(g.system[k]), jnp.asarray(g.master[k]), W)
            return jnp.sum(r * r)

        grad = jax.grad(f)(jnp.zeros(3))
        assert np.linalg.norm(np.asarray(grad)) > 0


class TestDoppler:
    def test_doppler_velocity_near_zero_at_static_start(self, epochs):
        """The sequence starts static: doppler velocity ≈ 0."""
        g = epochs
        k = 0
        x0 = jnp.asarray([-2418136.8695, 5385860.7891, 2405565.9777])
        pos, _, ok, _ = spp.solve_epoch(
            jnp.asarray(g.sat_pos[k]), jnp.asarray(g.psr_rov_corr[k]),
            jnp.asarray(g.system[k]), jnp.asarray(g.valid[k]),
            jnp.asarray(g.elevation[k]), jnp.asarray(g.snr[k]), x0)
        v, ddt = spp.doppler_velocity(
            jnp.asarray(g.sat_pos[k]), jnp.asarray(g.sat_vel[k]),
            jnp.asarray(g.dopp_rov[k] + g.sat_ddt[k]),
            jnp.asarray(g.system[k]), jnp.asarray(g.valid[k]),
            jnp.asarray(g.elevation[k]), jnp.asarray(g.snr[k]), pos)
        assert np.linalg.norm(np.asarray(v)) < 1.0  # static start


class TestNativeDecoder:
    def test_native_nav_matches_python(self):
        from glio_tpu.gnss import native
        if not native.available():
            pytest.skip("librinex_fast.so not built")
        a = native.parse_nav_native(NAV)
        b = rinex.parse_nav(NAV)
        assert set(a.keys()) == set(b.keys())
        for sat in list(a.keys())[::7]:
            for ea, eb in zip(a[sat], b[sat]):
                for f in ("week", "toe", "toes", "af0", "sqrt_a", "m0",
                          "omega0", "tgd"):
                    va, vb = getattr(ea, f), getattr(eb, f)
                    assert (np.isnan(va) and np.isnan(vb)) or va == vb

    def test_native_glo_nav_matches_python(self):
        # GLONASS 4-line state-vector records through the native decoder
        # (closes the SURVEY #20 'native nav skips R records' gap);
        # python parser = behavioral reference (rinex.c:1180-1240 v3 nav).
        from glio_tpu.gnss import native
        if not native.available():
            pytest.skip("librinex_fast.so not built")
        a = native.parse_nav_glo_native(NAV)
        b = rinex.parse_nav_glo(NAV)
        assert set(a.keys()) == set(b.keys()) and len(a) > 10
        for sat in a:
            assert len(a[sat]) == len(b[sat])
            for ea, eb in zip(a[sat], b[sat]):
                assert ea.toe == eb.toe and ea.freq_num == eb.freq_num
                for f in ("tau_n", "gamma_n", "health"):
                    assert getattr(ea, f) == getattr(eb, f)
                for f in ("pos", "vel", "acc"):
                    np.testing.assert_array_equal(getattr(ea, f),
                                                  getattr(eb, f))

    def test_native_matches_python(self):
        from glio_tpu.gnss import native
        if not native.available():
            pytest.skip("librinex_fast.so not built")
        a = native.parse_obs_native(OBS, "GC")
        b = rinex.parse_obs(OBS, "GC")
        assert len(a.epochs) == len(b.epochs)
        for ea, eb in zip(a.epochs[::100], b.epochs[::100]):
            assert ea.sats == eb.sats
            np.testing.assert_allclose(ea.psr, eb.psr)
            np.testing.assert_allclose(
                np.nan_to_num(ea.doppler), np.nan_to_num(eb.doppler))
        np.testing.assert_allclose(a.approx_pos, b.approx_pos)


class TestGnssTools:
    def test_prn_classification(self):
        from glio_tpu.gnss import tools
        assert tools.classify_prn(5) == 0      # GPS
        assert tools.classify_prn(40) == 1     # GLONASS
        assert tools.classify_prn(100) == 3    # BDS
        assert tools.classify_prn(170) == 3    # BDS extended
        np.testing.assert_array_equal(
            tools.classify_prn(np.array([1, 40, 100])), [0, 1, 3])

    def test_dop(self, epochs):
        from glio_tpu.gnss import tools
        g = epochs
        rcv = np.array([-2418136.8695, 5385860.7891, 2405565.9777])
        gdop, pdop, hdop, vdop = tools.dop(rcv, g.sat_pos[0], g.valid[0])
        assert 1.0 < float(gdop) < 10.0
        assert float(hdop) < float(gdop)
        assert float(pdop) < float(gdop)

    def test_skyplot(self):
        from glio_tpu.gnss import tools
        x, y = tools.skyplot_coordinates(np.array([0.0, np.pi / 2]),
                                         np.array([np.pi / 2, 0.0]))
        np.testing.assert_allclose([x[0], y[0]], [0, 0], atol=1e-12)
        np.testing.assert_allclose([x[1], y[1]], [1, 0], atol=1e-12)


class TestSecondSequence:
    """Multi-sequence capability: the TST (light-urban) dataset with a
    multi-constellation F9P receiver (BASELINE.json configs list)."""
    TST = "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/tst20210517"

    @pytest.mark.skipif(not os.path.exists(
        "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/tst20210517"),
        reason="TST dataset absent")
    def test_tst_spp(self):
        g = converter.convert(
            f"{self.TST}/20210517.light-urban.tste.ublox.f9p.obs",
            f"{self.TST}/hksc137c.nav",
            station_ecef=STATION,
            opts=converter.ConvertOptions(max_epochs=40, systems="GEC"))
        assert g.valid.sum(1).mean() > 6
        x0 = jnp.asarray(STATION, jnp.float64)
        pos, clk, ok, rms = spp.solve_epochs(
            jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov_corr),
            jnp.asarray(g.system), jnp.asarray(g.valid),
            jnp.asarray(g.elevation), jnp.asarray(g.snr), x0)
        okn = np.asarray(ok)
        assert okn.sum() > 30
        llh = np.asarray(C.ecef2llh(pos))[okn]
        lat, lon = np.rad2deg(llh[:, 0]), np.rad2deg(llh[:, 1])
        # TST East, Hong Kong.
        assert np.all(np.abs(np.median(lat) - 22.29) < 0.02)
        assert np.all(np.abs(np.median(lon) - 114.18) < 0.02)
        assert np.median(np.asarray(rms)[okn]) < 20.0


class TestGlonassEphemeris:
    """GLONASS state-vector ephemeris (VERDICT r1 item 10) against the
    real broadcast records shipped in the reference dataset."""

    NAV = ("/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/"
           "urbannavWhampoa/hksc141g.nav")

    def test_parse_real_records(self):
        from glio_tpu.gnss.rinex import parse_nav_glo
        glo = parse_nav_glo(self.NAV)
        assert len(glo) >= 20           # 24 GLONASS slots in the file
        g = glo["R01"][0]
        r = np.linalg.norm(g.pos)
        v = np.linalg.norm(g.vel)
        # GLONASS orbit: ~25 508 km radius; ECEF (rotating-frame) speed
        # = inertial ~3.95 km/s minus the ω×r share → ~2.5-4.5 km/s.
        assert 2.4e7 < r < 2.6e7, r
        assert 2.5e3 < v < 4.5e3, v
        assert g.freq_num in range(-7, 7)

    def test_integration_consistency_between_records(self):
        """Integrate record k to record k+1's epoch: the two broadcast
        states must agree to broadcast-ephemeris accuracy (the records
        are 30 min apart; RTKLIB's geph2pos shows the same agreement)."""
        from glio_tpu.gnss.ephemeris import glo_pos_vel
        from glio_tpu.gnss.rinex import parse_nav_glo
        glo = parse_nav_glo(self.NAV)
        checked = 0
        for sat, recs in glo.items():
            for a, b in zip(recs[:-1], recs[1:]):
                if not (0 < b.toe - a.toe <= 3600.0):
                    continue
                p, v = glo_pos_vel(a, b.toe)
                err_p = np.linalg.norm(p - b.pos)
                err_v = np.linalg.norm(v - b.vel)
                assert err_p < 20.0, (sat, err_p)
                assert err_v < 0.05, (sat, err_v)
                checked += 1
        assert checked >= 5, checked

    def test_clock_model(self):
        from glio_tpu.gnss.ephemeris import glo_clock
        from glio_tpu.gnss.rinex import parse_nav_glo
        glo = parse_nav_glo(self.NAV)
        g = glo["R01"][0]
        # At toe the bias equals −τ_n (file stores −τ_n in field 1).
        assert abs(glo_clock(g, g.toe) - (-g.tau_n)) < 1e-15
        # Clock bias magnitude sane (< 1 ms).
        assert abs(glo_clock(g, g.toe + 900.0)) < 1e-3

    def test_converter_with_glonass(self):
        """Full converter on the TST f9p file (has R observations) with
        systems='GRC': GLONASS satellites must land in the epoch tensors
        with sane elevations and FDMA wavelengths."""
        from glio_tpu.gnss import converter
        from glio_tpu.gnss.rinex import SYS_GLO
        base = ("/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/"
                "tst20210517")
        station = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
        g = converter.convert(
            f"{base}/20210517.light-urban.tste.ublox.f9p.obs",
            f"{base}/hksc137c.nav", station_ecef=station,
            opts=converter.ConvertOptions(systems="GRC", max_epochs=40))
        n_glo = int(((np.asarray(g.system) == SYS_GLO)
                     & np.asarray(g.valid)).sum())
        assert n_glo > 20, n_glo
        m = (np.asarray(g.system) == SYS_GLO) & np.asarray(g.valid)
        els = np.asarray(g.elevation)[m]
        assert (els > np.deg2rad(15.0) - 1e-9).all()
        # Satellite positions on the GLONASS shell.
        r = np.linalg.norm(np.asarray(g.sat_pos)[m], axis=-1)
        assert ((r > 2.4e7) & (r < 2.6e7)).all()


class TestWindowBindingRealData:
    """Bind REAL Whampoa epochs to golden-trajectory keyframes and
    evaluate the window DD + Doppler rows at the golden poses — validates
    the GNSS-in-window data path on real data (VERDICT r1 weak #5)."""

    ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])

    @pytest.fixture(scope="class")
    def bound(self, epochs):
        from glio_tpu.eval.trajectory import read_result_csv
        sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
        # Keyframes overlapping the converted epoch span.
        t0, t1 = epochs.time[0], epochs.time[-1]
        sel = (sw.time >= t0 - 0.5) & (sw.time <= t1 + 0.5)
        kf_time = sw.time[sel]
        p_kf = sw.enu[sel]
        out = dd.bind_epochs_to_keyframes(epochs, kf_time, 32)
        return out, kf_time, p_kf

    def test_binding_coverage(self, bound):
        out, kf_time, _ = bound
        # The receiver reports ~1 Hz epochs vs ~3 Hz keyframes: roughly a
        # third of intervals should bind, and bound slots carry sats.
        frac = out["gnss_valid"].mean()
        assert frac > 0.2, frac
        nsat = out["gnss_sv_valid"][out["gnss_valid"]].sum(-1)
        assert (nsat >= 4).all()
        # Doppler channel present on bound epochs.
        ndop = out["gnss_dopp_valid"][out["gnss_valid"]].sum(-1)
        assert (ndop >= 4).all()

    def test_dd_rows_bounded_at_golden_poses(self, bound):
        out, kf_time, p_kf = bound
        anchor = jnp.asarray(self.ANCHOR)
        meds = []
        for k in range(1, len(kf_time)):
            if not out["gnss_valid"][k]:
                continue
            r = gnss_factors.dd_psr_residual(
                jnp.asarray(p_kf[k - 1]), jnp.asarray(p_kf[k]),
                jnp.asarray(out["gnss_ratio"][k]), anchor,
                jnp.asarray(0.0), jnp.asarray(STATION),
                jnp.asarray(out["gnss_sat_pos"][k]),
                jnp.asarray(out["gnss_psr_rov"][k]),
                jnp.asarray(out["gnss_psr_sta"][k]),
                jnp.asarray(out["gnss_sv_valid"][k]),
                jnp.asarray(out["gnss_system"][k]),
                jnp.asarray(out["gnss_master"][k]),
                jnp.asarray(out["gnss_whiten"][k]))
            r = np.asarray(r)
            nz = np.abs(r[np.abs(r) > 1e-9])
            if len(nz):
                meds.append(np.median(nz))
        assert len(meds) >= 10
        # Whitened DD at the golden poses: deep-urban NLOS leaves heavy
        # tails, but the median per epoch must be measurement-scale (the
        # synthesized-station atmosphere bound), not km-scale garbage.
        assert np.median(meds) < 20.0, np.median(meds)

    def test_doppler_rows_bounded_at_golden_velocity(self, bound):
        out, kf_time, p_kf = bound
        anchor = jnp.asarray(self.ANCHOR)
        # Golden velocities by central differences.
        v_kf = np.gradient(p_kf, kf_time, axis=0)
        meds = []
        for k in range(1, len(kf_time)):
            if not out["gnss_valid"][k]:
                continue
            r = gnss_factors.doppler_residual(
                jnp.asarray(p_kf[k - 1]), jnp.asarray(v_kf[k - 1]),
                jnp.asarray(p_kf[k]), jnp.asarray(v_kf[k]),
                jnp.asarray(out["gnss_ratio"][k]),
                jnp.asarray(0.0),               # rcv_ddt unknown here
                anchor, jnp.asarray(0.0),
                jnp.asarray(out["gnss_sat_pos"][k]),
                jnp.asarray(out["gnss_sat_vel"][k]),
                jnp.asarray(out["gnss_sat_ddt"][k]),
                jnp.asarray(out["gnss_dopp"][k]),
                jnp.asarray(out["gnss_dopp_valid"][k]),
                jnp.asarray(np.maximum(out["gnss_dopp_std"][k], 1e-3)))
            r = np.asarray(r)
            nz = r[np.abs(r) > 1e-9]
            if len(nz) >= 4:
                # The receiver clock drift is a common additive term the
                # window estimates; remove its per-epoch mean here.
                meds.append(np.median(np.abs(nz - np.mean(nz))))
        assert len(meds) >= 10
        # Whitened, drift-removed Doppler rows at golden velocity:
        # sub-(m/s)/sigma scale.
        assert np.median(meds) < 3.0, np.median(meds)


class TestTstMultiConstellation:
    """Real TST (light-urban) sequence with GPS+GLONASS+BDS: the per-
    constellation-clock WLS consumes all systems, and adding GLONASS
    must not degrade the solution (parity with the reference's
    4-constellation GNSS_Tools WLS, gnss_tools.h:588-870)."""

    BASE = ("/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/"
            "tst20210517")

    @pytest.fixture(scope="class")
    def tst_epochs(self):
        from glio_tpu.gnss import converter
        return converter.convert(
            f"{self.BASE}/20210517.light-urban.tste.ublox.f9p.obs",
            f"{self.BASE}/hksc137c.nav", station_ecef=STATION,
            opts=converter.ConvertOptions(systems="GRC", max_epochs=50))

    def test_spp_with_glonass(self, tst_epochs):
        from glio_tpu.gnss import spp
        from glio_tpu.gnss.rinex import SYS_GLO
        g = tst_epochs
        x0 = jnp.asarray(STATION)          # TST is ~km from the station
        # All constellations.
        pos_all, clk, ok_all, rms_all = spp.solve_epochs(
            jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov_corr),
            jnp.asarray(g.system), jnp.asarray(g.valid),
            jnp.asarray(g.elevation), jnp.asarray(g.snr), x0)
        # Without GLONASS.
        v_ng = jnp.asarray(g.valid & (g.system != SYS_GLO))
        pos_ng, _, ok_ng, rms_ng = spp.solve_epochs(
            jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov_corr),
            jnp.asarray(g.system), v_ng,
            jnp.asarray(g.elevation), jnp.asarray(g.snr), x0)
        ok_all = np.asarray(ok_all); ok_ng = np.asarray(ok_ng)
        assert ok_all.sum() >= 45
        # GLONASS satellites genuinely joined the solve (the receiver
        # acquires R sats gradually over the first epochs).
        n_glo = ((np.asarray(g.system) == SYS_GLO)
                 & np.asarray(g.valid)).sum(1)
        assert n_glo[ok_all].max() >= 3
        assert (n_glo[ok_all] >= 1).mean() > 0.9
        # Solutions agree (GLONASS adds, not breaks: no frame/clock bug).
        both = ok_all & ok_ng
        d = np.linalg.norm(np.asarray(pos_all)[both]
                           - np.asarray(pos_ng)[both], axis=-1)
        assert np.median(d) < 15.0, np.median(d)
        # GLONASS clock unknown is resolved (slot 1 non-zero when used).
        clk = np.asarray(clk)
        assert np.abs(clk[ok_all][:, 1]).max() > 1.0
        # Fixes land near the TST area (~22.293N 114.172E).
        llh = np.asarray(C.ecef2llh(jnp.asarray(pos_all)))[ok_all]
        lat = np.rad2deg(llh[:, 0]); lon = np.rad2deg(llh[:, 1])
        assert np.all(np.abs(lat - 22.293) < 0.02), lat[:3]
        assert np.all(np.abs(lon - 114.172) < 0.02), lon[:3]


class TestRinex2:
    """RINEX 2.11 observation decode (the CORS base-station format the
    reference's launch names: run_urban_hk.launch:32, hksc1410.21o;
    RTKLIB handles v2 at rinex.c:632-735)."""

    def test_roundtrip_v3_to_v2_identical_epochs(self, tmp_path):
        """Rewrite 50 epochs of the real v3 rover file as v2.11 and
        assert the decoded streams are identical (time, sats, psr,
        carrier, doppler, snr, lli) — VERDICT r2 item 3's validation."""
        v3 = rinex.parse_obs(OBS, systems="GC")
        v3.epochs = v3.epochs[:50]
        v2_path = str(tmp_path / "rover_v2.obs")
        rinex.write_obs_v2(v3, v2_path)
        v2 = rinex.parse_obs(v2_path, systems="GC")
        assert len(v2.epochs) == len(v3.epochs)
        np.testing.assert_allclose(v2.approx_pos, v3.approx_pos, atol=1e-3)
        for e3, e2 in zip(v3.epochs, v2.epochs):
            assert abs(e2.time - e3.time) < 1e-6
            assert e2.sats == e3.sats
            np.testing.assert_allclose(e2.psr, e3.psr, atol=5e-4)
            # v2 F14.3 truncates carrier cycles to 3 decimals.
            np.testing.assert_allclose(e2.carrier, e3.carrier, atol=5e-3,
                                       rtol=1e-9)
            np.testing.assert_allclose(e2.doppler, e3.doppler, atol=5e-4)
            np.testing.assert_allclose(e2.snr, e3.snr, atol=5e-4)
            np.testing.assert_array_equal(e2.lli, e3.lli)

    def test_v2_station_path_through_converter(self, tmp_path):
        """station_obs_path accepts a v2.11 file: DD station pseudoranges
        decoded from v2 match the ones decoded from the same data as v3."""
        from glio_tpu.gnss.converter import ConvertOptions
        v3 = rinex.parse_obs(OBS, systems="GC")
        v3.epochs = v3.epochs[:30]
        v2_path = str(tmp_path / "station_v2.obs")
        rinex.write_obs_v2(v3, v2_path)
        opts = ConvertOptions(systems="GC", max_epochs=30)
        g_v2 = converter.convert(OBS, NAV, station_ecef=STATION,
                                 station_obs_path=v2_path, opts=opts)
        # Feeding the rover file itself as the 'station' file means every
        # epoch matches: psr_sta must equal psr_rov wherever valid.
        m = g_v2.valid
        np.testing.assert_allclose(g_v2.psr_sta[m], g_v2.psr_rov[m],
                                   atol=5e-4)

    def test_v2_twelve_plus_sats_continuation(self, tmp_path):
        """Epochs with >12 satellites exercise the satellite-list
        continuation line."""
        v3 = rinex.parse_obs(OBS, systems="GC")
        big = [ep for ep in v3.epochs if len(ep.sats) > 12][:3]
        assert big, "expected a >12-sat epoch in the Whampoa file"
        v3.epochs = big
        v2_path = str(tmp_path / "big.obs")
        rinex.write_obs_v2(v3, v2_path)
        v2 = rinex.parse_obs(v2_path, systems="GC")
        for e3, e2 in zip(big, v2.epochs):
            assert e2.sats == e3.sats


def test_gps_utc_leap_table():
    """Leap-second offset derives from the record date (ADVICE r2): the
    2021 UrbanNav data gets 18 s, pre-2017 dates get their own offsets."""
    assert rinex.gps_utc_leap(2021, 5, 21) == 18.0
    assert rinex.gps_utc_leap(2016, 12, 31) == 17.0
    assert rinex.gps_utc_leap(2013, 1, 1) == 16.0
    assert rinex.gps_utc_leap(2008, 6, 1) == 14.0
    assert rinex.gps_utc_leap(1999, 1, 1) == 13.0
    # Full table back to the GPS epoch (pre-1999 dates were wrong before
    # round 3: the truncated table returned 13 s for all of 1980-1998).
    assert rinex.gps_utc_leap(1996, 6, 1) == 11.0
    assert rinex.gps_utc_leap(1992, 1, 1) == 7.0
    assert rinex.gps_utc_leap(1985, 7, 1) == 4.0
    assert rinex.gps_utc_leap(1981, 1, 1) == 0.0
    assert rinex.gps_utc_leap(1980, 1, 6) == 0.0


def test_obs_flag1_epoch_kept(tmp_path):
    """Epoch flag 1 (power failure between epochs) is a VALID observation
    epoch per the RINEX spec and RTKLIB; both parsers must keep it."""
    v3 = rinex.parse_obs(OBS, systems="GC")
    v3.epochs = v3.epochs[:3]
    v2_path = str(tmp_path / "flag1.obs")
    rinex.write_obs_v2(v3, v2_path)
    txt = open(v2_path).read().splitlines(keepends=True)
    out, flipped = [], 0
    for line in txt:
        # v2 epoch lines: " yy mm dd hh mm ss.sssssss  f nn..." — flip the
        # SECOND epoch's flag 0 -> 1.
        if (len(line) > 32 and line[1:3].strip().isdigit()
                and line[26:29].strip() == "0"):
            flipped += 1
            if flipped == 2:
                line = line[:28] + "1" + line[29:]
        out.append(line)
    open(v2_path, "w").writelines(out)
    v2 = rinex.parse_obs(v2_path, systems="GC")
    assert len(v2.epochs) == 3
    assert v2.epochs[1].sats == v3.epochs[1].sats
