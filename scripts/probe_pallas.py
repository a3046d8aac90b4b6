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


def _try_copy_kernel(q):
    """The most trivial Mosaic program possible: an 8x128 VMEM copy.

    Distinguishes "Mosaic AOT compilation is dead on this platform" from
    "the kNN kernel specifically trips it" (VERDICT r3 item 8).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    y = pl.pallas_call(
        copy_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)
    y.block_until_ready()
    q.put("copy-ok" if float(y[3, 17]) == float(x[3, 17]) else "copy-bad")


def _try_compile(q):
    import jax.numpy as jnp
    from glio_tpu.ops.knn_pallas import knn_pallas
    query = jnp.zeros((8, 3), jnp.float32)
    qv = jnp.ones((8,), bool)
    pts = jnp.zeros((128, 3), jnp.float32).at[:, 0].set(
        jnp.arange(128, dtype=jnp.float32))
    pv = jnp.ones((128,), bool)
    d, i = knn_pallas(query, qv, pts, pv, k=5, query_tile=8, map_tile=128)
    d.block_until_ready()
    q.put("ok")


def _bounded(target, timeout_s: float):
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=target, args=(q,))
    proc.start()
    proc.join(timeout_s)
    if proc.is_alive():
        proc.terminate()
        proc.join(5)
        return "hang"
    if proc.exitcode == 0 and not q.empty():
        return q.get()
    return f"exit-{proc.exitcode}"


def main(timeout_s: float = 90.0) -> int:
    copy = _bounded(_try_copy_kernel, timeout_s)
    if copy != "copy-ok":
        print(f"PALLAS-DEAD: even an 8x128 copy kernel fails ({copy}) — "
              "Mosaic AOT itself is broken on this platform, not any "
              "specific kernel")
        return 1
    knn = _bounded(_try_compile, timeout_s)
    if knn == "ok":
        print("PALLAS-OK: Mosaic compile succeeded — the fused kernel "
              "path can be re-enabled")
        return 0
    print(f"PALLAS-PARTIAL: copy kernel compiles but the kNN kernel "
          f"fails ({knn}) — kernel-specific issue")
    return 2


if __name__ == "__main__":
    sys.exit(main())
