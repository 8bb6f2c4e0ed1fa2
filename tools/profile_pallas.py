"""TPU parity + speed check: sw_pallas vs sw_jax on engine-like shapes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reseek_tpu.search.engine import configure_jax
configure_jax()
import jax, jax.numpy as jnp, numpy as np
from reseek_tpu.ops.sw_np import NEG
from reseek_tpu.ops import sw_jax, sw_pallas

print("backend:", jax.default_backend())

def timeit(label, f, *args, n=5):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{label:38s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

rng = np.random.default_rng(0)
for B, L in [(2048, 96), (1024, 192), (455, 384), (113, 768), (28, 1536)]:
    s = rng.integers(-3, 4, (B, L, L)).astype(np.float32)
    s = jnp.asarray(s)
    print(f"--- B={B} L={L} ---")
    r_old = timeit("scan sw_score_batch", jax.jit(
        sw_jax.sw_score_batch, static_argnames=("open_", "ext")), s, -2.0, -1.0)
    r_new = timeit("pallas sw_score", sw_pallas.sw_score_pallas, s, -2.0, -1.0)
    ok = np.array_equal(np.asarray(r_old), np.asarray(r_new))
    print("  score parity:", ok)
    if B <= 512:
        b_o, i_o, j_o, tb_o = jax.jit(
            sw_jax.sw_traceback_batch, static_argnames=("open_", "ext"))(s, -2.0, -1.0)
        b_n, i_n, j_n, tb_n = timeit(
            "pallas sw_traceback", sw_pallas.sw_traceback_pallas, s, -2.0, -1.0, n=3)
        print("  tb parity:", np.array_equal(np.asarray(b_o), np.asarray(b_n)),
              np.array_equal(np.asarray(i_o), np.asarray(i_n)),
              np.array_equal(np.asarray(j_o), np.asarray(j_n)),
              np.array_equal(np.asarray(tb_o), np.asarray(tb_n)))

# skew-only timing
import functools
from reseek_tpu.ops.sw_pallas import skew as skew_new
for B, L in [(1024, 192), (455, 384), (113, 768)]:
    s = jnp.asarray(rng.integers(-3, 4, (B, L, L)).astype(np.float32))
    f = jax.jit(functools.partial(skew_new, d_pad=8))
    timeit(f"skew pad-reshape B={B} L={L}", f, s)
