"""Point-cloud map export (PCD) — the reference's ``save_pcd`` capability
(``Estimator.cpp:5324-5349``, config ``save_pcd``/``mapping_interval``)."""

import numpy as np


def write_pcd(path: str, points: np.ndarray, valid=None) -> int:
    """Write an ASCII PCD v0.7 file. Returns the number of points written."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    if valid is not None:
        pts = pts[np.asarray(valid).reshape(-1)]
    n = pts.shape[0]
    with open(path, "w") as f:
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
            f"COUNT 1 1 1\nWIDTH {n}\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA ascii\n")
        np.savetxt(f, pts, fmt="%.4f")
    return n


def read_pcd(path: str) -> np.ndarray:
    """Read an ASCII xyz PCD written by write_pcd."""
    with open(path) as f:
        lines = f.readlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("DATA")) + 1
    return np.loadtxt(lines[start:], dtype=np.float32).reshape(-1, 3)


def assemble_map(scans, scan_valid, p, q, every: int = 3,
                 ql2b=(1.0, 0.0, 0.0, 0.0), tl2b=(0.0, 0.0, 0.0)):
    """World-frame map cloud from keyframe scans + poses
    (``mapping_interval`` downsampling like the reference).

    ``scans`` are LIDAR-frame points (the Episode contract); ql2b/tl2b is
    the lidar→body extrinsic the estimator applies (body_from_lidar)."""
    import jax.numpy as jnp
    from ..factors.lidar import body_from_lidar
    from ..utils import quat
    sel = slice(0, None, every)
    body = body_from_lidar(jnp.asarray(scans[sel], jnp.float64),
                           jnp.asarray(ql2b, jnp.float64),
                           jnp.asarray(tl2b, jnp.float64))
    world = np.asarray(
        quat.rotate(jnp.asarray(q[sel])[:, None, :], body)
        + jnp.asarray(p[sel])[:, None, :])
    return world.reshape(-1, 3), np.asarray(scan_valid[sel]).reshape(-1)
