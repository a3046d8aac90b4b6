"""LC fusion on real Whampoa: golden-SW odometry + our RTK-float DD fixes,
compared against the reference's lc_result.csv."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from glio_tpu.data.episode import GnssEpochs
from glio_tpu.eval.trajectory import read_result_csv, associate, ate_rmse
from glio_tpu.gnss import rtk
from glio_tpu.models import lc_fusion
from glio_tpu.utils import coords as C
from glio_tpu.utils import quat

ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
STATION = np.array([-2414266.9200, 5386768.9870, 2407460.0310])

z = np.load("/tmp/whampoa_gnss.npz")
g = GnssEpochs(**{k: z[k] for k in z.files})
sw = read_result_csv("/root/reference/result/tc_sw_result.csv")
lc = read_result_csv("/root/reference/result/lc_result.csv")

fixes, covs, oks, ndd = rtk.solve_epochs_dd(
    jnp.asarray(g.sat_pos), jnp.asarray(g.psr_rov), jnp.asarray(g.psr_sta),
    jnp.asarray(g.valid), jnp.asarray(g.system, jnp.int32),
    jnp.asarray(g.master), jnp.asarray(STATION), jnp.asarray(g.elevation),
    jnp.asarray(g.snr), jnp.asarray(ANCHOR))
fixes = np.asarray(fixes)
sig = np.sqrt(np.maximum(np.trace(np.asarray(covs), axis1=1, axis2=2) / 3, 1e-6))
okn = np.asarray(oks) & (sig < 5.0)   # gnssCovThreshold
print(f"RTK fixes: {okn.sum()}/{len(okn)} pass the covariance gate")

q_odo = np.asarray(quat.from_ypr(jnp.asarray(np.deg2rad(sw.ypr_deg))))
enu_fix = np.asarray(C.ecef2enu(jnp.asarray(fixes), jnp.asarray(ANCHOR)))
ia, ib = associate(sw.time, g.time, max_dt=0.25)
T = sw.enu.shape[0]
gp = np.zeros((T, 3)); gv = np.zeros(T, bool); gs = np.ones(T)
for a, b in zip(ia, ib):
    if okn[b]:
        gp[a] = enu_fix[b]; gv[a] = True; gs[a] = max(sig[b], 0.5)
prob = lc_fusion.build_problem(sw.enu, q_odo, gp, gv, gs, min_spacing_m=5.0)
print(f"GNSS factors used: {int(np.asarray(prob.gnss_valid).sum())}")
p, q, cost = lc_fusion.solve(prob, jnp.asarray(sw.enu), jnp.asarray(q_odo),
                             gn_iters=8, pcg_iters=400)
p = np.asarray(p)
ia2, ib2 = associate(sw.time, lc.time)
r0, e0 = ate_rmse(sw.enu[ia2], lc.enu[ib2])
r1, e1 = ate_rmse(p[ia2], lc.enu[ib2])
off = np.median(p[ia2] - lc.enu[ib2], axis=0)
r2, e2 = ate_rmse(p[ia2] - off, lc.enu[ib2])
print(f"golden-SW vs golden-LC: rmse {r0:.2f} max {e0.max():.1f}")
print(f"OUR LC vs golden-LC:    rmse {r1:.2f} max {e1.max():.1f} median {np.median(e1):.2f}")
print(f"offset {off.round(2)}; shape rmse {r2:.2f} median {np.median(e2):.2f}")
