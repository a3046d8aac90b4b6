"""TST light-urban control run (VERDICT r4 #2) — regression pins.

The control experiment for the Whampoa accuracy-floor claims: the same
converter → SPP → robust DD → float filter → LAMBDA chain on the
reference's second, cleaner dataset must produce mutually-consistent
solutions at the few-metre level (Whampoa deep-urban: ~60 m common-mode
NLOS) with covered cross-method discrepancies. Numbers measured
round 5 (scripts/tst_control.py; README "TST control run").
"""
import os
import sys

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.real_data,
              pytest.mark.skipif(
                  not os.path.isdir("/root/reference/GraphGNSSLibV1.1/"
                                    "global_fusion/dataset/tst20210517"),
                  reason="reference TST dataset absent")]

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.fixture(scope="module")
def results():
    import tst_control
    out, sols = {}, {}
    for rx in ("m8t", "f9p"):
        out[rx], sols[rx] = tst_control.run_receiver(
            rx, return_solutions=True)
    out["cross"] = tst_control.cross_receiver(sols["m8t"], sols["f9p"])
    return out


def test_epoch_counts(results):
    # Full-file decode parity (both receivers, native or python path).
    assert results["m8t"]["epochs"] == 782
    assert results["f9p"]["epochs"] == 657


def test_spp_availability(results):
    # Light urban: SPP solves nearly every epoch (Whampoa deep urban is
    # noticeably worse); f9p sees ~18 sats (GREC) vs m8t ~11 (GC).
    assert results["m8t"]["spp_ok_rate"] > 0.80
    assert results["f9p"]["spp_ok_rate"] > 0.88
    assert results["f9p"]["sats_median"] > results["m8t"]["sats_median"]


def test_cross_consistency_metres_not_tens(results):
    """The headline control result: on clean data the three independent
    solution types agree at the FEW-METRE level. On Whampoa the same
    chain shows ~60 m common-mode NLOS discrepancy — so the Whampoa
    floor is the data, not the stack (measured r5: m8t 3.2/6.3 m,
    f9p 3.7/5.3 m)."""
    for rx in ("m8t", "f9p"):
        assert results[rx]["spp_vs_dd_med_m"] < 8.0
        assert results[rx]["dd_vs_float_med_m"] < 12.0


def test_covariance_honesty_on_clean_data(results):
    """|DD − float| normalized by the combined reported σ: median ≲ 1
    means the reported covariances COVER the cross-method discrepancy
    without being wildly conservative (measured r5: 0.81 / 0.72)."""
    for rx in ("m8t", "f9p"):
        assert 0.2 < results[rx]["dd_float_norm_med"] < 2.0


def test_float_filter_passes_more_on_richer_constellation(results):
    # GREC (f9p) carries ~2x the DD rows of GC (m8t): the honest
    # covariance gate passes correspondingly more epochs.
    assert results["f9p"]["float_gate_rate"] > results["m8t"]["float_gate_rate"]
    assert results["f9p"]["float_gate_rate"] > 0.6


def test_cross_receiver_agreement(results):
    """The strongest no-ground-truth evidence: the two rovers recorded
    the SAME drive simultaneously with independent hardware, tracking
    loops, AND constellations (GC vs GREC). Their gated solutions agree
    to single-receiver error scale (measured r5: DD median 7.1 m,
    float 9.8 m over 136/238 jointly-gated epochs ⇒ ~5 m per-receiver
    error on light urban; Whampoa's same-chain common-mode discrepancy
    is ~60 m)."""
    c = results["cross"]
    assert c["common_epochs"] == 652
    assert c["dd_cross_med_m"] < 12.0
    assert c["float_cross_med_m"] < 15.0
    assert c["dd_cross_n"] >= 50 and c["float_cross_n"] >= 100


def test_ar_stays_honest(results):
    """With a synthesized station the DD carrier retains the rover's
    true-minus-model atmosphere, so the ratio test rightly refuses to
    fix most epochs (same honest behavior as Whampoa) — pin that AR
    does not silently claim fixes it cannot justify."""
    for rx in ("m8t", "f9p"):
        assert results[rx]["ar_fix_rate"] < 0.2
