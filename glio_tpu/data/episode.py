"""Tensorized episode format — the replay contract.

The reference streams measurements over ROS topics between four processes
(SURVEY.md §1); this framework replaces that bus with a single fixed-shape
episode that the estimators replay deterministically (BASELINE.json north
star: "the ROS/RTKLIB I/O layer is reduced to an offline converter that
emits tensorized UrbanNav sequences").

An Episode holds, for T keyframes:
  * per-interval IMU runs, padded to ``max_imu_per_interval`` with masks
    (the stream the reference buffers in ``imu_buf``, Estimator.cpp),
  * per-keyframe body-frame surf feature clouds, padded to ``scan_points``
    (output of the preprocessing + odometry front end, topics
    ``/surf_features`` → keyframe clouds),
  * per-epoch GNSS double-difference measurement tensors padded to
    ``max_sats`` (what ``GNSSPsrCarRov1``/``GNSSPsrCarStation1`` carry,
    after satellite states are baked in — see glio_tpu.gnss),
  * ground-truth poses when available (the SPAN-CPT channel).
"""

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GnssEpochs:
    """Tensorized GNSS epochs — the framework's replacement for the
    ``GNSS_Raw_Array`` wire format (nlosExclusion/msg/GNSS_Raw.msg):
    satellite states are baked in by the converter so the device never
    touches ephemerides (SURVEY.md §7 item 1)."""
    time: np.ndarray            # (E,) epoch times (GPS seconds as unix)
    sat_pos: np.ndarray         # (E, MAX_SV, 3) ECEF sat pos (tx frame)
    sat_vel: np.ndarray         # (E, MAX_SV, 3)
    sat_ddt: np.ndarray         # (E, MAX_SV) sat clock drift (m/s)
    psr_rov: np.ndarray         # (E, MAX_SV) RAW rover pseudoranges (m)
    psr_sta: np.ndarray         # (E, MAX_SV) RAW station pseudoranges (m)
    psr_rov_corr: np.ndarray    # (E, MAX_SV) corrected rover psr (SPP use)
    dopp_rov: np.ndarray        # (E, MAX_SV) range-rate (m/s) = −doppler·λ
    elevation: np.ndarray       # (E, MAX_SV) radians
    snr: np.ndarray             # (E, MAX_SV) dB-Hz
    valid: np.ndarray           # (E, MAX_SV) bool
    system: np.ndarray          # (E, MAX_SV) int8 constellation id (0..3)
    master: np.ndarray          # (E, 4) int32 master slot per system (−1 none)
    # Carrier-phase channel (GNSS_Raw.msg carrier_phase/lambda/LLI fields;
    # feeds the RTK float filter, rtkpos.cpp parity). Optional: None when
    # the source had no usable carrier.
    car_rov: Optional[np.ndarray] = None    # (E, MAX_SV) carrier (m)
    car_sta: Optional[np.ndarray] = None    # (E, MAX_SV) station carrier (m)
    car_valid: Optional[np.ndarray] = None  # (E, MAX_SV) bool
    lli: Optional[np.ndarray] = None        # (E, MAX_SV) int8 loss-of-lock
    sat_id: Optional[np.ndarray] = None     # (E, MAX_SV) int32 sys*100+prn
                                            # (slot→satellite identity for
                                            # cross-epoch arc tracking)
    station_synthesized: Optional[np.ndarray] = None  # () bool: DD built
                                            # against a synthesized base
                                            # (atmosphere floor applies)


@dataclasses.dataclass
class Episode:
    """One replayable sequence. All arrays are numpy on host; the model
    converts to device arrays (f32 clouds / f64 states) at replay time."""
    # Keyframe timing.
    kf_time: np.ndarray         # (T,)
    # IMU runs between keyframe i-1 and i (run 0 is empty/invalid).
    imu_acc: np.ndarray         # (T, NI, 3)
    imu_gyr: np.ndarray         # (T, NI, 3)
    imu_dt: np.ndarray          # (T, NI)
    imu_valid: np.ndarray       # (T, NI) bool
    # Body-frame surf clouds per keyframe.
    scan: np.ndarray            # (T, S, 3) float32
    scan_valid: np.ndarray      # (T, S) bool
    # Initial state.
    p0: np.ndarray              # (3,)
    q0: np.ndarray              # (4,)
    v0: np.ndarray              # (3,)
    # IMU sample at the first keyframe time (midpoint seed for interval 1).
    acc0: Optional[np.ndarray] = None   # (3,)
    gyr0: Optional[np.ndarray] = None   # (3,)
    # Optional ground truth at keyframe times.
    gt_p: Optional[np.ndarray] = None   # (T, 3)
    gt_q: Optional[np.ndarray] = None   # (T, 4)
    gt_v: Optional[np.ndarray] = None   # (T, 3)
    # Optional GNSS.
    gnss: Optional[GnssEpochs] = None
    # Georeference: local ENU anchor in ECEF + yaw offset (config values in
    # the reference: anc_ecef_*, yaw_enu_local).
    anchor_ecef: Optional[np.ndarray] = None
    # None = "not set by the dataset" (falls back to the config value);
    # 0.0 is a legitimate yaw and must be distinguishable from unset.
    yaw_enu_local: Optional[float] = None
    # Optional dense (non-key) frame odometry per keyframe segment — the
    # reference's 10 Hz ``/each_odom`` stream that feeds
    # ``optimizeLocalGraph`` (Estimator.cpp:4274-4558).  Hop j→j+1 along
    # segment k, frame 0 = left keyframe, last valid hop ends at the right
    # keyframe (models.local_graph.interpolate_segments contract).
    dense_rel_dp: Optional[np.ndarray] = None     # (T-1, D+1, 3)
    dense_rel_dq: Optional[np.ndarray] = None     # (T-1, D+1, 4)
    dense_rel_valid: Optional[np.ndarray] = None  # (T-1, D+1) bool
    dense_time: Optional[np.ndarray] = None       # (T-1, D) interior times

    @property
    def num_keyframes(self):
        return self.kf_time.shape[0]

    def to_inputs(self, max_sv: int = 32):
        """Stacked KeyframeInput pytree for models.sliding_window.make_replay."""
        from ..gnss.dd import bind_epochs_to_keyframes
        from ..models.sliding_window import GnssKfData, KeyframeInput
        b = bind_epochs_to_keyframes(self.gnss, self.kf_time, max_sv)
        gnss = GnssKfData(
            sat_pos=jnp.asarray(b["gnss_sat_pos"]),
            psr_rov=jnp.asarray(b["gnss_psr_rov"]),
            psr_sta=jnp.asarray(b["gnss_psr_sta"]),
            sv_valid=jnp.asarray(b["gnss_sv_valid"]),
            system=jnp.asarray(b["gnss_system"]),
            master=jnp.asarray(b["gnss_master"]),
            whiten=jnp.asarray(b["gnss_whiten"]),
            ratio=jnp.asarray(b["gnss_ratio"]),
            valid=jnp.asarray(b["gnss_valid"]),
            sat_vel=jnp.asarray(b["gnss_sat_vel"]),
            sat_ddt=jnp.asarray(b["gnss_sat_ddt"]),
            dopp=jnp.asarray(b["gnss_dopp"]),
            dopp_valid=jnp.asarray(b["gnss_dopp_valid"]),
            dopp_std=jnp.asarray(b["gnss_dopp_std"]),
        )
        return KeyframeInput(
            imu_acc=jnp.asarray(self.imu_acc),
            imu_gyr=jnp.asarray(self.imu_gyr),
            imu_dt=jnp.asarray(self.imu_dt),
            imu_valid=jnp.asarray(self.imu_valid),
            scan=jnp.asarray(self.scan, jnp.float32),
            scan_valid=jnp.asarray(self.scan_valid),
            time=jnp.asarray(self.kf_time),
            gnss=gnss,
        )

    def save(self, path: str):
        data = dataclasses.asdict(self)
        flat = {}

        def add(prefix, d):
            for k, v in d.items():
                if isinstance(v, dict):
                    add(f"{prefix}{k}.", v)
                elif v is not None:
                    flat[f"{prefix}{k}"] = np.asarray(v)

        add("", data)
        np.savez_compressed(path, **flat)

    @staticmethod
    def load(path: str) -> "Episode":
        z = np.load(path)
        gnss_keys = [k for k in z.files if k.startswith("gnss.")]
        gnss = None
        if gnss_keys:
            gnss = GnssEpochs(**{k.split(".", 1)[1]: z[k] for k in gnss_keys})
        kwargs = {k: z[k] for k in z.files if "." not in k}
        ep = Episode(gnss=gnss, **{k: v for k, v in kwargs.items()
                                   if k != "yaw_enu_local"})
        if "yaw_enu_local" in z.files:
            ep.yaw_enu_local = float(z["yaw_enu_local"])
        return ep
