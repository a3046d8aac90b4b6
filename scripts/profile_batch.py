"""Profile the batch-stage pieces in ISOLATED processes (CLAUDE.md rule:
never time stages inside one long run on the remote backend).

Usage:
  python scripts/profile_batch.py            # runs every piece in a subprocess
  python scripts/profile_batch.py PIECE      # time one piece (child mode)

Pieces: assemble, solve_cr, solve_cholpcg, cost, weights, lm_iter, stage
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import subprocess
import sys
import time

import numpy as np

DATA = "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/urbannavWhampoa"
ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])
T_CAP = 2048
REPS = 5


def _problem():
    import jax.numpy as jnp
    from glio_tpu.config import GlioConfig
    from glio_tpu.data.episode import GnssEpochs
    from glio_tpu.eval.trajectory import read_result_csv
    from glio_tpu.gnss import converter
    from glio_tpu.models import batch as B
    from glio_tpu.utils import quat

    cache = "/tmp/whampoa_gnss.npz"
    if _os.path.exists(cache):
        z = np.load(cache)
        g = GnssEpochs(**{k: z[k] for k in z.files})
    else:
        g = converter.convert(
            f"{DATA}/20210521.medium-urban.whampoa.ublox.m8t.GC.obs",
            f"{DATA}/hksc141g.nav", station_ecef=STATION)
    sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
    q_odo = np.asarray(quat.from_ypr(jnp.asarray(np.deg2rad(sw.ypr_deg))))
    cfg = GlioConfig()
    T = min(sw.enu.shape[0], T_CAP)
    prob = B.build_problem(cfg, sw.enu[:T], q_odo[:T], sw.time[:T], g,
                           ANCHOR, 0.0, STATION)
    return cfg, prob, B


def _time(fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS


def child(piece: str):
    import jax
    import jax.numpy as jnp
    cfg, prob, B = _problem()
    from glio_tpu.solver import banded
    hw = cfg.estimator.search_range + 1
    p, q = prob.p_odo, prob.q_odo
    th = jnp.asarray(8.0, jnp.float64)
    rob = B.RobustOpts(dd_huber=1.0, epoch_gate=2.0, rel_huber=5.0)

    if piece == "assemble":
        f = jax.jit(lambda p, q: B._assemble(p, q, prob, th, hw))
        dt = _time(f, p, q)
    elif piece == "assemble_mixed":
        f = jax.jit(lambda p, q: B._assemble(p, q, prob, th, hw,
                                             mixed=True))
        dt = _time(f, p, q)
    elif piece in ("solve_cr", "solve_cholpcg"):
        band, grad = jax.jit(
            lambda p, q: B._assemble(p, q, prob, th, hw))(p, q)
        band = band.at[:, hw].add(1e-2 * jnp.eye(6, dtype=band.dtype))
        sol = (banded.cyclic_reduction_solve if piece == "solve_cr"
               else banded.pcg_chol_solve)
        f = jax.jit(lambda b, g: sol(b, -g))
        dt = _time(f, band, grad)
    elif piece == "cost":
        f = jax.jit(lambda p, q: B._total_cost(p, q, prob, th))
        dt = _time(f, p, q)
    elif piece == "weights":
        # Weights are now derived inside the assembly pass; time the
        # combined robust assembly instead.
        f = jax.jit(lambda p, q: B._assemble_robust(
            p, q, prob, th, hw, False, rob, True)[:3])
        dt = _time(f, p, q)
    elif piece == "lm_iter":
        # One full robust LM iteration (what solve_batch_once scans).
        dt = _time(lambda p, q: B.solve_batch_once(
            cfg, prob, p, q, th, 1, 60, "direct", rob), p, q)
    elif piece == "stage":
        dt = _time(lambda p, q: B.solve_batch_once(
            cfg, prob, p, q, th, 10, 60, "direct", rob), p, q)
    else:
        raise SystemExit(f"unknown piece {piece}")
    print(f"PIECE {piece} {dt:.4f}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
        sys.exit(0)
    pieces = ["assemble", "assemble_mixed", "solve_cr", "solve_cholpcg",
              "cost", "weights", "lm_iter", "stage"]
    out = {}
    for pc in pieces:
        res = subprocess.run([sys.executable, _os.path.abspath(__file__), pc],
                             capture_output=True, text=True, timeout=1800,
                             cwd=_os.path.dirname(_os.path.dirname(
                                 _os.path.abspath(__file__))))
        for line in res.stdout.splitlines():
            if line.startswith("PIECE"):
                out[pc] = float(line.split()[2])
        if pc not in out:
            out[pc] = f"FAILED: {res.stderr[-400:]}"
    print(json.dumps(out, indent=1))
