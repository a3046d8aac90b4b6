"""Verbatim reference-YAML config loading (config_compat)."""
import warnings

import pytest

from glio_tpu.config_compat import load_reference_yaml, reference_yaml_to_dict
from glio_tpu.config import load_config

REF_YAML = "/root/reference/GLIO/config/config_urban_hk.yaml"


def test_reference_yaml_loads_without_warnings():
    """Every key of the shipped config_urban_hk.yaml must be consumed
    (mapped or recognized as ROS-only plumbing) — no warn-and-default."""
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_reference_yaml(REF_YAML)
    assert [str(x.message) for x in w] == []
    # Spot-check each mapping class: pass-through, camelCase rename,
    # scalar-triplet group, quaternion group.
    assert cfg.imu.gravity == 9.80511
    assert cfg.lidar_odometry.edge_threshold == 1.0
    assert cfg.lidar_odometry.surf_threshold == 0.1
    assert cfg.initialization.anc_ecef == (-2419233.42, 5385473.13, 2405341.30)
    assert cfg.initialization.euler_rpy_deg == (0.6825, 0.098, 60.8)
    assert cfg.initialization.station_ecef == (-2414266.92, 5386768.987,
                                               2407460.031)
    assert cfg.estimator.edge_ds_range == 0.4
    assert cfg.estimator.gnss_cov_threshold == 5
    assert cfg.estimator.pose_cov_threshold == 10
    assert cfg.estimator.ql2b == (1.0, 0.0, 0.0, 0.0)
    assert cfg.estimator.tl2b == (0.0, 0.0, 0.28)
    assert cfg.estimator.sms_fusion_level == 0
    assert cfg.estimator.slide_window_width == 5
    assert cfg.feature_selection.batch_rand_set_num == 400


def test_unknown_key_warns_and_defaults():
    data = {"Estimator": {"slide_window_width": 7, "not_a_real_key": 3}}
    with pytest.warns(UserWarning, match="not_a_real_key"):
        cfg = load_config(reference_yaml_to_dict(data))
    assert cfg.estimator.slide_window_width == 7
    # Unmapped key fell back to the default.
    assert cfg.estimator.local_map_width == 50


def test_partial_triplet_group_warns_by_name():
    """A typo in one member of a scalar-triplet group must produce a
    specific incomplete-group warning (advisor r4) — not generic
    unknown-key warnings for the surviving members."""
    data = {"initialization": {"anc_ecef_x": 1.0, "anc_ecef_y": 2.0,
                               "anc_ecef_zz": 3.0}}
    with pytest.warns(UserWarning) as rec:
        load_config(reference_yaml_to_dict(data))
    msgs = [str(r.message) for r in rec]
    assert any("incomplete group initialization.anc_ecef" in m
               and "anc_ecef_z" in m for m in msgs)
    # The present members must NOT degrade to unknown-key warnings.
    assert not any("anc_ecef_x" in m and "incomplete" not in m for m in msgs)


def test_ros_only_keys_skip_silently():
    data = {"common": {"frame_id": "GLIO"},
            "visualization": {"GTinLocal": True},
            "IMU": {"imu_topic": "/imu/data", "gravity": 9.8}}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_config(reference_yaml_to_dict(data))
    assert [str(x.message) for x in w] == []
    assert cfg.imu.gravity == 9.8
