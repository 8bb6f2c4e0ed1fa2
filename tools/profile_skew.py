"""Split skew cost: pad+reshape vs transpose; debug tb parity on TPU."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reseek_tpu.search.engine import configure_jax
configure_jax()
import jax, jax.numpy as jnp, numpy as np
from reseek_tpu.ops.sw_np import NEG
from reseek_tpu.ops import sw_jax, sw_pallas

def timeit(label, f, *args, n=5):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{label:42s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

rng = np.random.default_rng(0)
for B, L in [(455, 384), (113, 768)]:
    s = jnp.asarray(rng.integers(-3, 4, (B, L, L)).astype(np.float32))
    d = 2 * L - 1
    dp = -(-d // 8) * 8

    @jax.jit
    def shear_only(s):
        b, la, lb = s.shape
        p = jnp.pad(s, ((0, 0), (0, 0), (0, dp + 1 - lb)),
                    constant_values=NEG)
        return p.reshape(b, la * (dp + 1))[:, : la * dp].reshape(b, la, dp)

    @jax.jit
    def transpose_only(p):
        return jnp.transpose(p, (2, 0, 1))

    print(f"--- B={B} L={L} ---")
    p = timeit("shear (pad+reshape)", shear_only, s)
    timeit("transpose (2,0,1)", transpose_only, p)

# tb parity debug on one shape
B, L = 64, 192
s = np.full((B, L, L), NEG, np.float32)
las = rng.integers(5, L + 1, B); lbs = rng.integers(5, L + 1, B)
for k in range(B):
    s[k, :las[k], :lbs[k]] = rng.integers(-3, 4, (las[k], lbs[k]))
s = jnp.asarray(s)
b_o, i_o, j_o, tb_o = jax.jit(sw_jax.sw_traceback_batch,
                              static_argnames=("open_", "ext"))(s, -2.0, -1.0)
b_n, i_n, j_n, tb_n = sw_pallas.sw_traceback_pallas(s, -2.0, -1.0)
b_o, i_o, j_o = np.asarray(b_o), np.asarray(i_o), np.asarray(j_o)
b_n, i_n, j_n = np.asarray(b_n), np.asarray(i_n), np.asarray(j_n)
tb_o, tb_n = np.asarray(tb_o), np.asarray(tb_n)
print("best equal:", np.array_equal(b_o, b_n))
mi = np.flatnonzero((i_o != i_n) | (j_o != j_n))
print("bi/bj mismatches:", len(mi), mi[:10])
for k in mi[:5]:
    print(f"  k={k} best={b_o[k]}/{b_n[k]} scan(i,j)=({i_o[k]},{j_o[k]}) "
          f"pallas=({i_n[k]},{j_n[k]})")
print("tb shapes:", tb_o.shape, tb_n.shape,
      "equal on D:", np.array_equal(tb_o, tb_n[:tb_o.shape[0]]))
