"""Multi-chip sharded search: DB shards across the mesh, queries replicate
or shard on a second axis, per-shard scores merge via global top-k.

This replaces the reference's single-node std::thread work stealing
(src/runself.cpp:72-99, SURVEY §2.8) with SPMD over a jax.sharding.Mesh:
target chains are sharded on the 'db' axis, query batches are sharded on
the 'q' axis (data parallel), and jax.lax.top_k over the full target axis
makes XLA insert the all-gather over ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


def make_mesh(n_devices: int):
    """2D mesh ('q', 'db'): query-data-parallel x db-sharded."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()[:n_devices]
    nq = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    arr = np.array(devs).reshape(nq, n_devices // nq)
    return Mesh(arr, ("q", "db"))


def make_sharded_search_step(mesh, params, top_k: int = 4):
    """Builds a jitted all-pairs scoring + global-top-k step.

    step(q_codes [NQ, F, L], t_codes [NT, F, L], w [D+1, D+1])
      -> (top_scores [NQ, k], top_idx [NQ, k])

    q sharded on 'q', targets sharded on 'db'; the top_k over the target
    axis produces cross-'db' collectives.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from reseek_tpu.ops.smx_jax import smx_batch_gather
    from reseek_tpu.ops.sw_jax import sw_score_batch

    open_, ext = float(params.gap_open), float(params.gap_ext)

    def step(q_codes, t_codes, w):
        def per_query(qc):  # qc [F, L]
            nt = t_codes.shape[0]
            qa = jnp.broadcast_to(qc[None], (nt,) + qc.shape)
            s = smx_batch_gather(qa, t_codes, w, None)
            return sw_score_batch(s, open_, ext)  # [NT]

        scores = jax.vmap(per_query)(q_codes)  # [NQ, NT]
        tv, ti = jax.lax.top_k(scores, top_k)
        return tv, ti

    q_sh = NamedSharding(mesh, P("q", None, None))
    t_sh = NamedSharding(mesh, P("db", None, None))
    w_sh = NamedSharding(mesh, P(None, None))
    out_sh = NamedSharding(mesh, P("q", None))
    return jax.jit(step, in_shardings=(q_sh, t_sh, w_sh),
                   out_shardings=(out_sh, out_sh))


def sharded_search_demo(n_devices: int, nq: int = 2, nt: int = 8,
                        length: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Build a mesh, shard tiny synthetic chains, run ONE step.  Used by the
    multichip dry-run; returns (top scores, top indices)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from reseek_tpu.chain import Chain
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.encoder.dss import encode_chain
    from reseek_tpu.ops.smx_jax import flat_codes, flat_layout

    params = DSSParams.create("sensitive")
    mesh = make_mesh(n_devices)
    nq_ax = mesh.shape["q"]
    db_ax = mesh.shape["db"]
    nq = max(nq, nq_ax) * nq_ax // np.gcd(max(nq, nq_ax), nq_ax)
    nt = int(np.ceil(nt / db_ax) * db_ax)

    rng = np.random.default_rng(0)

    def synth_chain(i):
        # a wobbly helix-ish backbone, deterministic
        t = np.arange(length) * 0.6 + i
        coords = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t),
                           1.5 * np.arange(length, dtype=np.float64)],
                          axis=1)
        coords += rng.normal(0, 0.3, coords.shape)
        return Chain(f"c{i}", "A" * length, coords.astype(np.float32))

    offsets, d, w = flat_layout(params.features, params.weights)
    bucket = length

    def codes(c):
        return flat_codes(encode_chain(c).profile(params), offsets, d,
                          len(c), bucket)

    q = np.stack([codes(synth_chain(i)) for i in range(nq)])
    t = np.stack([codes(synth_chain(100 + i)) for i in range(nt)])

    step = make_sharded_search_step(mesh, params, top_k=min(4, nt))
    q_sh = NamedSharding(mesh, P("q", None, None))
    t_sh = NamedSharding(mesh, P("db", None, None))
    qd = jax.device_put(jnp.asarray(q), q_sh)
    td = jax.device_put(jnp.asarray(t), t_sh)
    wd = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P(None, None)))
    tv, ti = step(qd, td, wd)
    return np.array(tv), np.array(ti)
