"""First full-trajectory (T=3493) batch solve on the TPU + parity
(VERDICT r2 item 1: the round-2 benchmarks capped at a 2048 prefix after
a worker crash under the retired f64 sequential solver; the round-3
mixed-precision stage removes both the time and memory pressure)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import numpy as np

DATA = "/root/reference/GraphGNSSLibV1.1/global_fusion/dataset/urbannavWhampoa"
ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from glio_tpu.config import GlioConfig
    from glio_tpu.data.episode import GnssEpochs
    from glio_tpu.eval.trajectory import read_result_csv, associate, ate_rmse
    from glio_tpu.models import batch as B
    from glio_tpu.utils import quat

    z = np.load("/tmp/whampoa_gnss.npz")
    g = GnssEpochs(**{k: z[k] for k in z.files})
    sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
    bt = read_result_csv("/root/reference/result/tc_batch_result.csv")
    q_odo = np.asarray(quat.from_ypr(jnp.asarray(np.deg2rad(sw.ypr_deg))))
    cfg = GlioConfig()
    T = sw.enu.shape[0]
    prob = B.build_problem(cfg, sw.enu, q_odo, sw.time, g,
                           ANCHOR, 0.0, STATION)
    rob = B.RobustOpts(dd_huber=1.0, epoch_gate=2.0, rel_huber=5.0)
    # Parity iteration budget (the annealing stage-1 cost at full T needs
    # ~40 iterations to settle; matches scripts/batch_whampoa.py).
    iters = (40, 12, 8, 8)
    B.optimize_batch(cfg, prob, thresholds=(1e9, 10.0, 8.0, 6.0),
                     lm_iters=iters, robust=rob)
    t0 = time.time()
    p, q, costs = B.optimize_batch(cfg, prob, lm_iters=iters, robust=rob)
    np.asarray(p)
    dt = time.time() - t0
    p = np.asarray(p)
    ia, ib = associate(sw.time, bt.time)
    r1, e1 = ate_rmse(p[ia], bt.enu[ib])
    print(json.dumps({
        "keyframes": int(T), "tpu_s": round(dt, 2),
        "rmse_vs_golden_batch_m": round(float(r1), 2),
        "max_err_m": round(float(e1.max()), 1),
        "median_err_m": round(float(np.median(e1)), 2),
        "costs": [round(c) for c in costs]}))


if __name__ == "__main__":
    main()
