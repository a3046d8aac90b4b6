"""Per-stage timing of one level-1 batch LM iteration (isolated processes).

The level-1 TPU leg measured 13.1 s/LM-iter at T=2048 (round 4) against
a 15.1 s/iter CPU twin — nowhere near the level-0 stack's 27x/iter win,
so something in the 15-dof path bypasses the mixed-precision design.
Each stage below runs in its own child process (CLAUDE.md: never time
stages in one long run on the remote backend).

Run from the repo root on the real chip: python scripts/profile_sms1.py
(STAGE=<name> runs one stage inline; T=... overrides the size.)
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ["assemble_pose", "imu_jac", "cr_solve15", "cost_fn", "sms1_res",
          "dd_res"]
T = int(os.environ.get("T", 2048))


def run_stage(stage):
    import time
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from glio_tpu.config import GlioConfig
    from glio_tpu.data.simulator import simulate_gnss_epochs
    from glio_tpu.models import batch as B
    from glio_tpu.factors import imu as imu_factors

    ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
    STATION = np.array([-2414266.92, 5386768.987, 2407460.031])
    cfg = GlioConfig().replace(
        estimator=GlioConfig().estimator.__class__(sms_fusion_level=1))
    hw = cfg.estimator.search_range + 1
    R = cfg.estimator.search_range
    F = cfg.feature_selection.batch_feature_res_num
    rng = np.random.default_rng(0)
    kf_time = np.arange(T) / 3.0
    th = np.linspace(0, 3, T)
    p = jnp.asarray(np.stack([40 * th, 15 * np.sin(th), 0.5 * th], -1))
    q = jnp.asarray(np.tile([1.0, 0, 0, 0], (T, 1)))
    gnss = simulate_gnss_epochs(np.asarray(p), kf_time, ANCHOR, STATION,
                                psr_noise=0.5, seed=0)
    prob = B.build_problem(cfg, np.asarray(p), np.asarray(q), kf_time,
                           gnss, ANCHOR, 0.0, STATION, despike=False)
    # Synthetic sms rows with production occupancy (~25 rows/pair).
    mask = (rng.uniform(size=(T, R, F)) > 0.0) & (
        np.arange(T)[:, None, None] + np.arange(1, R + 1)[None, :, None] < T)
    nrm = rng.normal(size=(T, R, F, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    sms = B.Sms1Data(
        pts_i=jnp.asarray(rng.normal(size=(T, R, F, 3))),
        normal_j=jnp.asarray(nrm),
        cent_j=jnp.asarray(rng.normal(size=(T, R, F, 3))),
        score=jnp.asarray(rng.uniform(1.0, 7.5, (T, R, F))),
        mask=jnp.asarray(mask))
    params = imu_factors.ImuParams(cfg.imu.acc_n, cfg.imu.gyr_n,
                                   cfg.imu.acc_w, cfg.imu.gyr_w,
                                   cfg.imu.gravity)
    gravity = params.gravity_vec()
    NI = 40
    # build_imu_chain takes the Episode per-interval (T, NI, ...) buffers
    # and returns T-1 edges (interval 0 skipped).
    acc = jnp.asarray(rng.normal(size=(T, NI, 3)))
    gyr = jnp.asarray(rng.normal(size=(T, NI, 3)) * 0.1)
    dts = jnp.full((T, NI), 0.01)
    val = jnp.ones((T, NI), bool)
    chain = B.build_imu_chain(cfg, acc, gyr, dts, val)
    v = jnp.zeros((T, 3))
    ba = jnp.zeros((T, 3))
    bg = jnp.zeros((T, 3))
    threshold = jnp.asarray(8.0, jnp.float64)
    STATE15 = B.STATE15

    def timeit(fn, *args, n=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return 1e3 * (time.perf_counter() - t0) / n

    if stage == "assemble_pose":
        f = jax.jit(lambda p, q: B._assemble_sms1_pose(
            p, q, prob, sms, threshold, hw, mixed=True))
        print(f"assemble_sms1_pose     {timeit(f, p, q):10.1f} ms")
    elif stage == "sms1_res":
        f = jax.jit(lambda p, q: B._sms1_residuals(p, q, sms))
        print(f"sms1_residuals         {timeit(f, p, q):10.1f} ms")
    elif stage == "dd_res":
        f = jax.jit(lambda p: B._dd_residuals(p, prob, threshold))
        print(f"dd_residuals           {timeit(f, p):10.1f} ms")
    elif stage == "cost_fn":
        def cost(p, q, v, ba, bg):
            r_att = B._rel_residuals(p, q, prob)[..., :3]
            r_sms = B._sms1_residuals(p, q, sms)
            r_dd = B._dd_residuals(p, prob, threshold)
            r_imu = B._imu_chain_residuals(p, q, v, ba, bg, chain, gravity)
            return 0.5 * (jnp.sum(r_att ** 2) + jnp.sum(r_sms ** 2)
                          + jnp.sum(r_dd ** 2) + jnp.sum(r_imu ** 2))
        f = jax.jit(cost)
        print(f"cost_fn                {timeit(f, p, q, v, ba, bg):10.1f} ms")
    elif stage == "imu_jac":
        zero15 = jnp.zeros(STATE15, jnp.float64)
        from glio_tpu.utils import quat

        def imu_fn(di, dj, S, pre, valid, pi, qi, vi, bai, bgi,
                   pj, qj, vj, baj, bgj):
            pi2, qi2, vi2, bai2, bgi2 = (
                pi + di[0:3], quat.mul(qi, quat.exp(di[3:6])),
                vi + di[6:9], bai + di[9:12], bgi + di[12:15])
            pj2, qj2, vj2, baj2, bgj2 = (
                pj + dj[0:3], quat.mul(qj, quat.exp(dj[3:6])),
                vj + dj[6:9], baj + dj[9:12], bgj + dj[12:15])
            r = imu_factors.whitened_residual_cached(
                S, pre, pi2, qi2, vi2, bai2, bgi2,
                pj2, qj2, vj2, baj2, bgj2, gravity=gravity)
            return jnp.where(valid, r, 0.0)

        def jac(p, q, v, ba, bg):
            return jax.vmap(
                lambda *a: (imu_fn(zero15, zero15, *a),
                            jax.jacfwd(imu_fn, argnums=(0, 1))(
                                zero15, zero15, *a)))(
                chain.sqrt_info, chain.pres, chain.valid,
                p[:-1], q[:-1], v[:-1], ba[:-1], bg[:-1],
                p[1:], q[1:], v[1:], ba[1:], bg[1:])
        f = jax.jit(jac)
        print(f"imu_edge_jacfwd        {timeit(f, p, q, v, ba, bg):10.1f} ms")
    elif stage == "cr_solve15":
        from glio_tpu.solver import banded
        band = jnp.zeros((T, 2 * hw + 1, STATE15, STATE15), jnp.float64)
        eye = jnp.eye(STATE15, dtype=jnp.float64)
        band = band.at[:, hw].set(eye * (10.0 + jnp.arange(T)[:, None, None] % 3))
        band = band.at[:, hw + 1].set(0.5 * eye)
        band = band.at[:, hw - 1].set(0.5 * eye)
        g = jnp.asarray(rng.normal(size=(T, STATE15)))
        f = jax.jit(lambda b, g: banded.cyclic_reduction_solve_mixed(b, g))
        print(f"cr_solve_mixed 15x15   {timeit(f, band, g):10.1f} ms")
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    if os.environ.get("STAGE"):
        run_stage(os.environ["STAGE"])
    else:
        for s in STAGES:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, STAGE=s), capture_output=True,
                text=True, timeout=2400)
            out = [l for l in r.stdout.splitlines() if "ms" in l]
            print(out[0] if out else f"{s}: FAILED\n{r.stderr[-300:]}",
                  flush=True)
