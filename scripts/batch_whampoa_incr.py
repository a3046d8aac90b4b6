"""Incremental batch replay on golden-SW odometry + real Whampoa DD."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import time

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from glio_tpu.config import GlioConfig
from glio_tpu.eval.trajectory import read_result_csv, associate, ate_rmse
from glio_tpu.gnss import converter
from glio_tpu.models import batch as B
from glio_tpu.utils import quat

ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
DATA = "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/urbannavWhampoa"

sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
bt = read_result_csv("/root/reference/result/tc_batch_result.csv")
g = converter.convert(
    f"{DATA}/20210521.medium-urban.whampoa.ublox.m8t.GC.obs",
    f"{DATA}/hksc141g.nav", station_ecef=STATION)
p_odo = sw.enu
q_odo = np.asarray(quat.from_ypr(jnp.asarray(np.deg2rad(sw.ypr_deg))))
cfg = GlioConfig()
prob = B.build_problem(cfg, p_odo, q_odo, sw.time, g, ANCHOR, 0.0, STATION)
t0 = time.time()
# Same robust configuration as the one-shot parity runs (dd Huber +
# absolute epoch gate): without it, fully-weighted NLOS epochs drag the
# chain tens of metres vertically (measured: 35.8 m RMSE un-gated).
# Measured cadence trend vs the golden batch (rederive, robust, lm=4):
# every=250 -> 18.1 m; every=50 -> 12.8 m (median 8.9) in 690 s CPU —
# approaching the 8.6 m one-shot as `every` nears the reference's 10
# (Estimator.cpp:2740-2748). Keeping ORIGINAL odometry relatives instead
# of re-deriving was measured WORSE (44.8 m): chunk inits chain raw
# odometry hops from the corrected boundary and the absolute epoch gate
# then locks the GNSS out.
rob = B.RobustOpts(dd_huber=1.0, epoch_gate=2.0, rel_huber=5.0)
p, q = B.optimize_batch_incremental(
    cfg, prob, sw.time, every=50, lm_iters=4, relaxation_passes=80,
    robust=rob, rederive=True, verbose=True)
p = np.asarray(p)
print("incremental solve", round(time.time() - t0, 1), "s", flush=True)
ia, ib = associate(sw.time, bt.time)
r1, e1 = ate_rmse(p[ia], bt.enu[ib])
off = np.median(p[ia] - bt.enu[ib], axis=0)
r2, e2 = ate_rmse(p[ia] - off, bt.enu[ib])
print(f"OURS(incr) vs golden-batch: rmse {r1:.2f} max {e1.max():.1f} median {np.median(e1):.2f}")
print(f"offset {off.round(2)}; shape rmse {r2:.2f} max {e2.max():.1f} median {np.median(e2):.2f}")
np.save("/tmp/our_batch_incr_p.npy", p)
