"""Microbenchmark: mu_smx vs sw_score_batch vs skew, warm timings."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reseek_tpu.search.engine import configure_jax
configure_jax()
import jax, jax.numpy as jnp, numpy as np
from reseek_tpu.search.engine import _mu_matrix_padded
from reseek_tpu.ops.sw_jax import sw_score_batch, _skew

mumx = jnp.asarray(_mu_matrix_padded())

def timeit(label, f, *args, n=5):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{label:40s} {(time.time()-t0)/n*1000:9.2f} ms")
    return r

for B, L in [(2048, 96), (1024, 192)]:
    print(f"--- B={B} L={L} ---")
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 36, (B, L)), jnp.int32)
    b = jnp.asarray(rng.integers(0, 36, (B, L)), jnp.int32)

    @jax.jit
    def mu_smx(a, b):
        oh_a = jax.nn.one_hot(a, 37, dtype=jnp.bfloat16)
        oh_b = jax.nn.one_hot(b, 37, dtype=jnp.bfloat16)
        emb = jax.lax.dot_general(oh_a, mumx.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.dot_general(emb.astype(jnp.bfloat16), oh_b,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    s = timeit("mu_smx", mu_smx, a, b)
    skew_j = jax.jit(_skew)
    timeit("skew (take_along_axis)", skew_j, s)
    timeit("sw_score_batch", jax.jit(sw_score_batch, static_argnames=("open_","ext")),
           s, -2.0, -1.0)
    @jax.jit
    def fused(a, b):
        return sw_score_batch(mu_smx(a, b), -2.0, -1.0)
    timeit("fused smx+sw", fused, a, b)
