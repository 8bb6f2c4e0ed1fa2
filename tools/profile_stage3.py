"""Micro-profile of stage-3 components (SW traceback, path walk, LDDT)
at representative bucket shapes, warm, on the attached device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timeit(fn, *args, n=5):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    from reseek_tpu.search.engine import configure_jax
    configure_jax()
    import jax
    import jax.numpy as jnp
    from reseek_tpu.ops.sw_pallas import sw_traceback_pallas
    from reseek_tpu.ops.sw_jax import sw_traceback_batch
    from reseek_tpu.ops.postalign_jax import walk_traceback_batch, lddt_batch
    from reseek_tpu.ops.sw_sweep import sw_score_sweep_pallas

    rng = np.random.default_rng(0)
    for (b, la, lb) in [(46, 599, 599), (128, 599, 599), (256, 256, 256),
                        (1024, 128, 128)]:
        s = jnp.asarray(rng.normal(0, 2, (b, la, lb)).astype(np.float32))
        try:
            t_sw = timeit(lambda s=s: sw_traceback_pallas(s, -0.7, -0.05))
        except Exception as ex:
            print(f"[{b},{la},{lb}] sw_tb_pallas FAILED: {ex}")
            t_sw = float("nan")
        best, bi, bj, tbs = sw_traceback_pallas(s, -0.7, -0.05)
        walk = jax.jit(walk_traceback_batch)
        t_walk = timeit(walk, tbs, best, bi, bj)
        m = min(la, lb)
        cq = jnp.asarray(rng.normal(0, 8, (b, m, 3)).astype(np.float32))
        ct = jnp.asarray(rng.normal(0, 8, (b, m, 3)).astype(np.float32))
        valid = jnp.asarray(np.ones((b, m), bool))
        ncols = jnp.asarray(np.full(b, m, np.int32))
        lddt = jax.jit(lambda *a: lddt_batch(*a, with_risky=True))
        t_lddt = timeit(lddt, cq, ct, valid, ncols)
        t_sweep = timeit(lambda s=s: sw_score_sweep_pallas(
            s, -2.0, -1.0)) if lb % 128 == 0 else float("nan")
        print(f"[{b:4d},{la},{lb}] sw_tb {t_sw*1e3:8.1f}ms  "
              f"walk {t_walk*1e3:8.1f}ms  lddt {t_lddt*1e3:8.1f}ms  "
              f"sweep {t_sweep*1e3:8.1f}ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
