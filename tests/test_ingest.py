"""Raw-sensor ingestion tests: rosbag1 reader, ROS1 msg decoding, and the
full raw-streams → Episode front-end chain (VERDICT r1 item 8).

A minimal bag writer lives here (tests only) so the reader is validated
against independently-constructed bytes of the public rosbag v2.0 layout.
"""

import bz2
import struct

import numpy as np
import pytest

from glio_tpu.config import GlioConfig, ShapeConfig, LidarOdometryConfig
from glio_tpu.data import ingest
from glio_tpu.data.simulator import simulate_episode


# --- minimal rosbag v2.0 writer (fixture-side) --------------------------------

def _field(name: bytes, value: bytes) -> bytes:
    kv = name + b"=" + value
    return struct.pack("<I", len(kv)) + kv


def _record(fields, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields)
    return (struct.pack("<I", len(hdr)) + hdr
            + struct.pack("<I", len(data)) + data)


def _conn_record(cid: int, topic: str, typ: str) -> bytes:
    data = (_field(b"topic", topic.encode())
            + _field(b"type", typ.encode())
            + _field(b"md5sum", b"0" * 32)
            + _field(b"message_definition", b""))
    return _record([(b"op", b"\x07"),
                    (b"conn", struct.pack("<I", cid)),
                    (b"topic", topic.encode())], data)


def _msg_record(cid: int, t: float, raw: bytes) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return _record([(b"op", b"\x02"),
                    (b"conn", struct.pack("<I", cid)),
                    (b"time", struct.pack("<II", secs, nsecs))], raw)


def _ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(t: float, frame: str = "f") -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return struct.pack("<III", 0, secs, nsecs) + _ros_string(frame)


def serialize_imu(t: float, acc, gyr) -> bytes:
    cov = struct.pack("<9d", *([0.0] * 9))
    return (_ros_header(t)
            + struct.pack("<4d", 0.0, 0.0, 0.0, 1.0) + cov
            + struct.pack("<3d", *gyr) + cov
            + struct.pack("<3d", *acc) + cov)


def serialize_pointcloud2(t: float, xyz: np.ndarray,
                          ring: np.ndarray = None) -> bytes:
    n = xyz.shape[0]
    fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7)]
    step = 12
    if ring is not None:
        fields.append(("ring", 12, 4))
        step = 16
    fb = struct.pack("<I", len(fields))
    for name, off, dt in fields:
        fb += _ros_string(name) + struct.pack("<IBI", off, dt, 1)
    rec = np.zeros((n, step), np.uint8)
    rec[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    if ring is not None:
        rec[:, 12:14] = ring.astype(np.uint16).view(np.uint8).reshape(n, 2)
    data = rec.tobytes()
    return (_ros_header(t) + struct.pack("<II", 1, n) + fb
            + b"\x00" + struct.pack("<II", step, step * n)
            + struct.pack("<I", len(data)) + data + b"\x01")


def write_bag(path, scan_msgs, imu_msgs, compress="bz2"):
    """scan_msgs/imu_msgs: lists of (t, raw_bytes)."""
    chunks = b"".join(
        [_msg_record(1, t, raw) for t, raw in scan_msgs]
        + [_msg_record(2, t, raw) for t, raw in imu_msgs])
    payload = bz2.compress(chunks) if compress == "bz2" else chunks
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record([(b"op", b"\x03"),
                         (b"index_pos", struct.pack("<Q", 0)),
                         (b"conn_count", struct.pack("<I", 2)),
                         (b"chunk_count", struct.pack("<I", 1))],
                        b" " * 64))
        f.write(_conn_record(1, "/velodyne_points",
                             "sensor_msgs/PointCloud2"))
        f.write(_conn_record(2, "/imu/data", "sensor_msgs/Imu"))
        f.write(_record([(b"op", b"\x05"),
                         (b"compression", compress.encode()),
                         (b"size", struct.pack("<I", len(chunks)))],
                        payload))


# --- tests ---------------------------------------------------------------

def test_bag_roundtrip_and_msg_decode(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32) * 10
    ring = (np.arange(100) % 16).astype(np.uint16)
    acc = np.array([0.1, -0.2, 9.8])
    gyr = np.array([0.01, 0.02, -0.03])
    path = str(tmp_path / "t.bag")
    write_bag(path,
              [(10.5, serialize_pointcloud2(10.5, xyz, ring))],
              [(10.4, serialize_imu(10.4, acc, gyr)),
               (10.6, serialize_imu(10.6, acc, gyr))])
    conns, msgs = ingest.read_bag(path)
    assert {c["topic"] for c in conns.values()} == {
        "/velodyne_points", "/imu/data"}
    assert len(msgs) == 3
    # Decoding.
    for topic, typ, t, raw in msgs:
        if typ == "sensor_msgs/PointCloud2":
            st, flds = ingest.parse_pointcloud2(raw)
            assert abs(st - 10.5) < 1e-6
            np.testing.assert_allclose(flds["xyz"], xyz, rtol=1e-6)
            np.testing.assert_array_equal(flds["ring"], ring)
        else:
            st, q, g, a = ingest.parse_imu(raw)
            np.testing.assert_allclose(a, acc)
            np.testing.assert_allclose(g, gyr)


def test_bag_uncompressed_chunk(tmp_path):
    xyz = np.ones((5, 3), np.float32)
    path = str(tmp_path / "u.bag")
    write_bag(path, [(1.0, serialize_pointcloud2(1.0, xyz))], [],
              compress="none")
    _, msgs = ingest.read_bag(path, topics=["/velodyne_points"])
    assert len(msgs) == 1


def _sim_to_bag(tmp_path, T=10):
    """Simulated 10 Hz drive → raw sensor bag: dense raycast scans
    (unorganized points, what a real driver publishes) + the IMU interval
    buffers flattened back into a stream."""
    import jax.numpy as jnp
    from glio_tpu.data.simulator import PlaneWorld, raycast_scan
    from glio_tpu.utils import quat

    ep = simulate_episode(n_keyframes=T, kf_dt=0.1, scan_points=256,
                          seed=23, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0),
                          scan_noise=0.01)
    world = PlaneWorld(extent=max(200.0, np.abs(ep.gt_p).max() + 80.0),
                       seed=23)
    t0 = 1000.0
    scan_msgs = []
    for i in range(T):
        Rwb = np.asarray(quat.to_rotmat(jnp.asarray(ep.gt_q[i])))
        img, iv = raycast_scan(world, ep.gt_p[i], Rwb, n_rings=16,
                               n_cols=360,
                               rng=np.random.default_rng(100 + i))
        pts = img[iv]                      # unorganized cloud
        t = t0 + ep.kf_time[i]
        scan_msgs.append((t, serialize_pointcloud2(t, pts)))
    imu_msgs = []
    # Interval i covers (kf_time[i-1], kf_time[i]].
    for i in range(1, T):
        ts = t0 + ep.kf_time[i - 1] + np.cumsum(ep.imu_dt[i])
        for j in range(int(ep.imu_valid[i].sum())):
            imu_msgs.append((ts[j], serialize_imu(
                ts[j], ep.imu_acc[i, j], ep.imu_gyr[i, j])))
    # A pre-roll sample at the first keyframe for gravity alignment.
    imu_msgs.insert(0, (t0, serialize_imu(t0, ep.acc0, ep.gyr0)))
    path = str(tmp_path / "sim.bag")
    write_bag(path, scan_msgs, imu_msgs)
    return path, ep


def test_episode_from_rosbag_end_to_end(tmp_path):
    """Full chain: bag → organize → features → odometry keyframes →
    Episode; the resulting episode must replay through the estimator."""
    path, ep_src = _sim_to_bag(tmp_path)
    cfg = GlioConfig().replace(
        shapes=ShapeConfig(max_imu_per_interval=40, scan_points=256,
                           map_points=2048),
        lidar_odometry=LidarOdometryConfig(line_num=16),
    )
    ep = ingest.episode_from_rosbag(path, cfg, n_cols=360)
    T = ep.num_keyframes
    assert T >= 3
    assert ep.scan.shape == (T, 256, 3)
    assert ep.scan_valid.any(axis=1).all()
    # IMU intervals non-empty past the first keyframe.
    assert ep.imu_valid[1:].any(axis=1).all()
    # dt binning reconstructs the keyframe spacing.
    spans = ep.imu_dt.sum(axis=1)[1:]
    gaps = np.diff(ep.kf_time)
    np.testing.assert_allclose(spans, gaps, atol=0.02)
    # Gravity alignment: initial attitude maps mean acc ≈ +z·g.
    from glio_tpu.utils import quat
    import jax.numpy as jnp
    a_w = np.asarray(quat.rotate(jnp.asarray(ep.q0),
                                 jnp.asarray(ep.acc0)))
    assert a_w[2] > 9.0, a_w
    # Dense channel present and consistent shapes.
    assert ep.dense_rel_dp.shape[0] == T - 1
    # The episode replays through the sliding window without blowing up.
    from glio_tpu.models.sliding_window import make_replay
    replay, _ = make_replay(cfg)
    out = replay(ep.to_inputs(), ep.p0, ep.q0, ep.v0, ep.acc0, ep.gyr0)
    assert np.isfinite(np.asarray(out.p)).all()


def test_episode_from_pcd_dir(tmp_path):
    import jax.numpy as jnp
    from glio_tpu.data.simulator import PlaneWorld, raycast_scan
    from glio_tpu.eval.pointcloud import write_pcd
    from glio_tpu.utils import quat

    T = 6
    ep = simulate_episode(n_keyframes=T, kf_dt=0.1, scan_points=256,
                          seed=29, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0))
    world = PlaneWorld(extent=max(200.0, np.abs(ep.gt_p).max() + 80.0),
                       seed=29)
    for i in range(T):
        Rwb = np.asarray(quat.to_rotmat(jnp.asarray(ep.gt_q[i])))
        img, iv = raycast_scan(world, ep.gt_p[i], Rwb, n_rings=16,
                               n_cols=360,
                               rng=np.random.default_rng(200 + i))
        write_pcd(str(tmp_path / f"{1000 + ep.kf_time[i]:.3f}.pcd"),
                  img[iv])
    rows = []
    for i in range(1, T):
        ts = 1000.0 + ep.kf_time[i - 1] + np.cumsum(ep.imu_dt[i])
        for j in range(int(ep.imu_valid[i].sum())):
            rows.append(np.concatenate(
                [[ts[j]], ep.imu_acc[i, j], ep.imu_gyr[i, j]]))
    np.savetxt(str(tmp_path / "imu.csv"),
               np.asarray(rows), delimiter=",")
    cfg = GlioConfig().replace(
        shapes=ShapeConfig(max_imu_per_interval=40, scan_points=256,
                           map_points=2048),
        lidar_odometry=LidarOdometryConfig(line_num=16),
    )
    ep2 = ingest.episode_from_pcd_dir(str(tmp_path / "*.pcd"),
                                      str(tmp_path / "imu.csv"), cfg,
                                      n_cols=360)
    assert ep2.num_keyframes >= 2
    assert ep2.scan_valid.any()


def test_imu_decimation_preserves_interval_span(tmp_path):
    """Intervals holding more IMU samples than the budget are decimated
    (group-mean acc/gyr, group-sum dt) — never truncated: the preintegrated
    delta must still cover the WHOLE interval (review r2 finding)."""
    import jax.numpy as jnp
    from glio_tpu.data.simulator import PlaneWorld, raycast_scan
    from glio_tpu.utils import quat

    # 1 Hz scans at 100 Hz IMU → ~100 samples per interval >> NI=24.
    T = 4
    ep = simulate_episode(n_keyframes=T, kf_dt=1.0, scan_points=256,
                          seed=41, q_lb=(1, 0, 0, 0), t_lb=(0, 0, 0))
    world = PlaneWorld(extent=max(200.0, np.abs(ep.gt_p).max() + 80.0),
                       seed=41)
    t0 = 2000.0
    scan_msgs, imu_msgs = [], []
    for i in range(T):
        Rwb = np.asarray(quat.to_rotmat(jnp.asarray(ep.gt_q[i])))
        img, iv = raycast_scan(world, ep.gt_p[i], Rwb, n_rings=16,
                               n_cols=360,
                               rng=np.random.default_rng(300 + i))
        scan_msgs.append((t0 + ep.kf_time[i],
                          serialize_pointcloud2(t0 + ep.kf_time[i],
                                                img[iv])))
    for i in range(1, T):
        ts = t0 + ep.kf_time[i - 1] + np.cumsum(ep.imu_dt[i])
        for j in range(int(ep.imu_valid[i].sum())):
            imu_msgs.append((ts[j], serialize_imu(
                ts[j], ep.imu_acc[i, j], ep.imu_gyr[i, j])))
    imu_msgs.insert(0, (t0, serialize_imu(t0, ep.acc0, ep.gyr0)))
    path = str(tmp_path / "dec.bag")
    write_bag(path, scan_msgs, imu_msgs)
    cfg = GlioConfig().replace(
        shapes=ShapeConfig(max_imu_per_interval=24, scan_points=256,
                           map_points=2048),
        lidar_odometry=LidarOdometryConfig(line_num=16),
    )
    ep2 = ingest.episode_from_rosbag(path, cfg, n_cols=360)
    spans = ep2.imu_dt.sum(axis=1)[1:]
    gaps = np.diff(ep2.kf_time)
    # Decimated runs must still span each interval exactly.
    np.testing.assert_allclose(spans, gaps, atol=0.02)
    assert ep2.imu_dt.shape[1] == 24
    assert (ep2.imu_valid[1:].sum(axis=1) == 24).any()
