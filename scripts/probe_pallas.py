"""Per-round Pallas/Mosaic compile probe (VERDICT r2 item 10).

The platform's remote TPU hangs on Mosaic AOT compilation (reconfirmed
rounds 1-2), so Pallas kernels ship interpret-mode-tested with XLA paths
as the compute default. This probe tries ONE tiny real compile each
round, bounded by a hard timeout, so the day the platform bug is fixed
the fused kernel path reactivates instead of staying a permanent gap.

Run: `python scripts/probe_pallas.py` (from the repo root, axon backend).
Exit code 0 + "PALLAS-OK" → flip the kernels on. Anything else: keep XLA.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import multiprocessing as mp
import sys


def _try_compile(q):
    import jax.numpy as jnp
    from glio_tpu.ops.knn_pallas import knn_pallas
    query = jnp.zeros((8, 3), jnp.float32)
    qv = jnp.ones((8,), bool)
    pts = jnp.zeros((128, 3), jnp.float32).at[:, 0].set(
        jnp.arange(128, dtype=jnp.float32))
    pv = jnp.ones((128,), bool)
    d, i = knn_pallas(query, qv, pts, pv, k=5, tile=128)
    d.block_until_ready()
    q.put("ok")


def main(timeout_s: float = 90.0) -> int:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_try_compile, args=(q,))
    proc.start()
    proc.join(timeout_s)
    if proc.is_alive():
        proc.terminate()
        proc.join(5)
        print("PALLAS-HANG: Mosaic compile did not finish in "
              f"{timeout_s:.0f}s (platform bug still present)")
        return 1
    if proc.exitcode == 0 and not q.empty():
        print("PALLAS-OK: Mosaic compile succeeded — the fused kernel "
              "path can be re-enabled")
        return 0
    print(f"PALLAS-FAIL: probe process exited {proc.exitcode}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
