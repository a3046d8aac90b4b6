"""Scan preprocessing pipeline: raw Velodyne-style range images → feature
clouds.

Pipeline counterpart of the reference's ``Preprocessing`` node
(``GLIO/src/Preprocessing.cpp``): ring assignment, gyro-only deskew,
curvature, sextant edge/flat selection, voxel-filtered less-flat surf
cloud.  Composes the batched ops from ``glio_tpu.lidar.features`` /
``neighbors`` into one jitted per-scan function.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GlioConfig
from ..lidar import features, neighbors


class ScanFeatures(NamedTuple):
    surf: jnp.ndarray          # (S_out, 3) voxel-filtered less-flat points
    surf_valid: jnp.ndarray    # (S_out,)
    edge: jnp.ndarray          # (E_out, 3) sharp + less-sharp edge points
    edge_valid: jnp.ndarray    # (E_out,)
    flat: jnp.ndarray          # (F_out, 3) flat picks (for odometry)
    flat_valid: jnp.ndarray    # (F_out,)


def make_preprocessor(cfg: GlioConfig, surf_out: int = 2048,
                      edge_out: int = 512, flat_out: int = 512):
    lo = cfg.lidar_odometry
    fparams = features.FeatureParams(
        edge_threshold=lo.edge_threshold,
        surf_threshold=lo.surf_threshold)

    @jax.jit
    def process(points, valid, rel_time=None, q_scan=None):
        """points: (R, P, 3) ring-ordered scan; valid: (R, P).

        rel_time/q_scan enable gyro deskew (if_to_deskew; the UrbanNav
        config disables it, config_urban_hk.yaml:21).
        """
        if rel_time is not None and q_scan is not None and lo.if_to_deskew:
            ident = jnp.array([1.0, 0, 0, 0], points.dtype)
            points = features.deskew(points, rel_time, q_scan, ident)

        out = features.extract_features(points, valid, fparams)
        R, P = valid.shape
        flat_pts = points.reshape(R * P, 3)

        def compact(mask, n_out, voxel=None):
            m = mask.reshape(R * P)
            if voxel is not None:
                return neighbors.voxel_downsample(flat_pts, m, voxel, n_out)
            # Deterministic top-n_out by mask (order-preserving compaction).
            score = m.astype(jnp.float32)
            idx = jnp.argsort(-score, stable=True)[:n_out]
            return flat_pts[idx], m[idx]

        surf, surf_v = compact(out["less_flat"], surf_out,
                               voxel=0.4)            # Preprocessing voxel 0.4
        edge, edge_v = compact(out["less_sharp"], edge_out)
        flat, flat_v = compact(out["flat"], flat_out)
        return ScanFeatures(surf, surf_v, edge, edge_v, flat, flat_v)

    return process
