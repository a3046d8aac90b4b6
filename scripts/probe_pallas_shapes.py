"""Map the Mosaic-compile envelope of the Pallas kNN kernel (round 5).

The platform's Mosaic AOT hang healed mid-round-5 for small shapes
(`probe_pallas.py` → PALLAS-OK); this ladder probes which
(query, map, tile) sizes actually compile, each in a spawned child with
a hard timeout so a hang costs one rung, not the session.

Run: python scripts/probe_pallas_shapes.py          (axon backend)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import multiprocessing as mp
import time


def trial(q, Q, N, qt, mt):
    import numpy as np
    import jax.numpy as jnp
    from glio_tpu.ops.knn_pallas import knn_pallas
    rng = np.random.default_rng(0)
    qq = jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32))
    qv = jnp.ones((Q,), bool)
    p = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    pv = jnp.ones((N,), bool)
    t0 = time.perf_counter()
    d, i = knn_pallas(qq, qv, p, pv, k=5, query_tile=qt, map_tile=mt)
    np.asarray(d)
    compile_s = time.perf_counter() - t0
    # Steady-state timing (10 calls).
    t0 = time.perf_counter()
    for _ in range(10):
        d, i = knn_pallas(qq, qv, p, pv, k=5, query_tile=qt, map_tile=mt)
    np.asarray(d)
    run_ms = (time.perf_counter() - t0) / 10 * 1e3
    # Exactness vs the XLA path.
    from glio_tpu.lidar import neighbors
    dx, ix = neighbors.knn(qq, qv, p, pv, k=5)
    same = float((np.sort(np.asarray(ix), 1)
                  == np.sort(np.asarray(i), 1)).all(1).mean())
    q.put(f"ok compile={compile_s:.1f}s run={run_ms:.3f}ms idx_match={same:.4f}")


# Round-5 measured envelope (full ladder run): tiles (8,128) and
# (64,256) compile and run — the (64,256) rung is EXACT vs the XLA kNN
# (idx_match 1.0000) but slow (28.5 s compile, 5.26 ms/call vs XLA's
# sub-ms); every rung with tiles >= (128,512) HANGS in Mosaic AOT
# (300 s cap each). Boundary: between 64x256 and 128x512 tiles.
LADDER = [
    (64, 256, 64, 256),
    (128, 512, 128, 512),
    (256, 1024, 128, 512),
    (256, 1024, 256, 1024),
    (512, 2048, 256, 1024),
    (2048, 4096, 256, 1024),
    (2048, 20480, 256, 1024),
    (2048, 40960, 256, 1024),
    (5120, 20480, 256, 1024),   # the sliding-window association shape
    (2048, 40960, 512, 2048),
]


def main(timeout_s: float = 300.0):
    ctx = mp.get_context("spawn")
    for (Q, N, qt, mt) in LADDER:
        q = ctx.Queue()
        pr = ctx.Process(target=trial, args=(q, Q, N, qt, mt))
        pr.start()
        pr.join(timeout_s)
        if pr.is_alive():
            pr.terminate()
            pr.join(5)
            r = "HANG/TIMEOUT"
        else:
            r = q.get() if not q.empty() else f"exit-{pr.exitcode}"
        print(f"Q={Q} N={N} tiles=({qt},{mt}) "
              f"grid=({Q // qt},{N // mt}) -> {r}", flush=True)


if __name__ == "__main__":
    main()
