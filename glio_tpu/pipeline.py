"""End-to-end pipeline orchestration.

The reference wires four ROS processes via topics and writes three result
CSVs (``run_urban_hk.launch`` + the Estimator's writer threads).  This
module is that launch file's equivalent: one deterministic call that runs

  episode → sliding-window fusion        → tc_sw_result.csv
          → batch fusion (with GNSS DD)  → tc_batch_result.csv
          → RTK-float fixes + LC fusion  → lc_result.csv

over tensorized episodes, with the same CSV schema
(``t, week, tow, lat, lon, alt, yaw, pitch, roll, E, N, U``).
"""

import os
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import GlioConfig
from .data.episode import Episode
from .eval import trajectory as traj
from .models import batch as batch_mod
from .models import lc_fusion
from .models.sliding_window import make_replay
from .gnss import rtk
from .utils import coords as C
from .utils import quat


@dataclass
class PipelineResult:
    kf_time: np.ndarray
    p_sw: np.ndarray
    q_sw: np.ndarray
    p_batch: Optional[np.ndarray] = None
    q_batch: Optional[np.ndarray] = None
    p_lc: Optional[np.ndarray] = None
    q_lc: Optional[np.ndarray] = None


def _georef(p_local, q_local, anchor_ecef, yaw_enu_local):
    """Local → (llh, ypr, enu) for CSV output. With yaw=0 local == ENU."""
    sy, cy = np.sin(yaw_enu_local), np.cos(yaw_enu_local)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    enu = p_local @ Rz.T
    ecef = np.asarray(C.enu2ecef(jnp.asarray(enu), jnp.asarray(anchor_ecef)))
    llh = np.asarray(C.ecef2llh(jnp.asarray(ecef)))
    ypr = np.rad2deg(np.asarray(quat.to_ypr(jnp.asarray(q_local))))
    return llh, ypr, enu


def run_pipeline(ep: Episode, cfg: GlioConfig = GlioConfig(),
                 out_dir: Optional[str] = None,
                 run_batch: Optional[bool] = None,
                 run_lc: Optional[bool] = None,
                 sw_chunk: int = 100) -> PipelineResult:
    anchor = (np.asarray(ep.anchor_ecef) if ep.anchor_ecef is not None
              else np.asarray(cfg.initialization.anc_ecef))
    yaw = float(ep.yaw_enu_local or cfg.initialization.yaw_enu_local)
    station = np.asarray(cfg.initialization.station_ecef)

    # --- stage 1: tightly-coupled sliding window -------------------------
    # Replayed in bounded chunks through the checkpoint/resume API (bit-
    # identical to one scan): a single multi-minute device execution can
    # trip the remote TPU worker's watchdog on long trajectories.
    replay, _ = make_replay(cfg)
    inputs = ep.to_inputs()
    T = int(np.asarray(ep.kf_time).shape[0])
    acc0 = None if ep.acc0 is None else jnp.asarray(ep.acc0)
    gyr0 = None if ep.gyr0 is None else jnp.asarray(ep.gyr0)
    if T <= sw_chunk:
        out = replay(inputs, jnp.asarray(ep.p0), jnp.asarray(ep.q0),
                     jnp.asarray(ep.v0), acc0, gyr0)
        p_sw, q_sw = np.asarray(out.p), np.asarray(out.q)
    else:
        import jax as _jax
        carry = replay.make_initial_carry(
            jnp.asarray(ep.p0), jnp.asarray(ep.q0), jnp.asarray(ep.v0),
            acc0, gyr0, inputs_template=inputs)
        # Equal chunk sizes (last one padded by shrinking the first chunk
        # boundary) would need a second compile at most; just allow two
        # trace shapes: `sw_chunk` and the remainder.
        ps, qs = [], []
        for s in range(0, T, sw_chunk):
            part = _jax.tree.map(lambda a: a[s:s + sw_chunk], inputs)
            carry, out = replay.replay_from(carry, part)
            ps.append(np.asarray(out.p))
            qs.append(np.asarray(out.q))
        p_sw, q_sw = np.concatenate(ps), np.concatenate(qs)
    res = PipelineResult(kf_time=np.asarray(ep.kf_time), p_sw=p_sw, q_sw=q_sw)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        llh, ypr, enu = _georef(p_sw, q_sw, anchor, yaw)
        traj.write_result_csv(os.path.join(out_dir, "tc_sw_result.csv"),
                              res.kf_time, llh, ypr, enu)

    have_gnss = ep.gnss is not None
    if run_batch is None:
        run_batch = have_gnss and cfg.estimator.enable_batch_fusion
    if run_lc is None:
        run_lc = have_gnss

    # --- stage 2: batch fusion ------------------------------------------
    if run_batch:
        prob = batch_mod.build_problem(
            cfg, p_sw, q_sw, res.kf_time, ep.gnss, anchor, yaw, station)
        p_b, q_b, _ = batch_mod.optimize_batch(cfg, prob)
        res.p_batch = np.asarray(p_b)
        res.q_batch = np.asarray(q_b)
        if out_dir:
            llh, ypr, enu = _georef(res.p_batch, res.q_batch, anchor, yaw)
            traj.write_result_csv(
                os.path.join(out_dir, "tc_batch_result.csv"),
                res.kf_time, llh, ypr, enu)

    # --- stage 3: loosely-coupled fusion --------------------------------
    if run_lc:
        g = ep.gnss
        fixes, covs, oks, _ = rtk.solve_epochs_dd(
            jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov),
            jnp.asarray(g.psr_sta), jnp.asarray(g.valid),
            jnp.asarray(g.system, jnp.int32), jnp.asarray(g.master),
            jnp.asarray(station), jnp.asarray(g.elevation),
            jnp.asarray(g.snr), jnp.asarray(anchor))
        fixes = np.asarray(fixes)
        sig = np.sqrt(np.maximum(
            np.trace(np.asarray(covs), axis1=1, axis2=2) / 3.0, 1e-6))
        okn = np.asarray(oks) & (sig < cfg.estimator.gnss_cov_threshold)
        # Map epoch fixes onto keyframes by nearest time.
        ia, ib = traj.associate(res.kf_time, g.time, max_dt=0.2)
        gnss_p = np.zeros_like(p_sw)
        gnss_valid = np.zeros(p_sw.shape[0], bool)
        gnss_sigma = np.ones(p_sw.shape[0])
        enu_fix = np.asarray(C.ecef2enu(jnp.asarray(fixes),
                                        jnp.asarray(anchor)))
        sy, cy = np.sin(yaw), np.cos(yaw)
        RzT = np.array([[cy, sy, 0], [-sy, cy, 0], [0, 0, 1.0]])
        for a, b in zip(ia, ib):
            if okn[b]:
                gnss_p[a] = enu_fix[b] @ RzT.T
                gnss_valid[a] = True
                gnss_sigma[a] = sig[b]
        prob = lc_fusion.build_problem(p_sw, q_sw, gnss_p, gnss_valid,
                                       gnss_sigma)
        p_l, q_l, _ = lc_fusion.solve(
            prob, jnp.asarray(p_sw), jnp.asarray(q_sw))
        res.p_lc = np.asarray(p_l)
        res.q_lc = np.asarray(q_l)
        if out_dir:
            llh, ypr, enu = _georef(res.p_lc, res.q_lc, anchor, yaw)
            traj.write_result_csv(os.path.join(out_dir, "lc_result.csv"),
                                  res.kf_time, llh, ypr, enu)

    return res
