"""Collective per-query top-B candidate merge over a DB-sharded mesh.

Production semantics of the reference's RankedScoresBag
(src/rankedscoresbag.h:23, B = 1500 per src/prefiltermuparams.h:15) as a
device collective: each shard (one device here; one host in a multi-host
deployment) scans its contiguous slice of the target DB with the native
prefilter and keeps its local per-query top-B (target, score) lists; the
merge all-gathers the per-shard candidate lists over the 'db' mesh axis
and re-selects the global top-B per query on device.

Determinism / tie rules: score descending, then ascending global target
index.  The reference's boundary tie set depends on thread scheduling
(RankedScoresBag::AddScore races), so any deterministic tie-break is
within its behavior envelope; this one matches the host RankedScoresBag
in reseek_tpu/search/prefilter.py, so mesh and single-host selections are
identical (asserted in tests/test_topk.py and the multichip dryrun).

XLA's top_k breaks value ties by lower position; candidates are gathered
shard-ascending with each shard's list score-sorted and tie-sorted by
ascending local index, so "lower position" is exactly "ascending global
target index" when shards are contiguous ascending slices.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

PAD_SCORE = np.int32(-(1 << 30))


@functools.lru_cache(maxsize=None)
def _merge_fn(mesh, axis: str, nq: int, b_local: int, top_b: int):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from reseek_tpu.search.engine import shard_map_compat

    k_out = min(top_b, b_local * mesh.devices.size)

    def local(sv, ti):
        # local views [1, nq, b_local]; gather -> [n_dev, nq, b_local]
        g_sv = jax.lax.all_gather(sv[0], axis, axis=0)
        g_ti = jax.lax.all_gather(ti[0], axis, axis=0)
        allv = jnp.transpose(g_sv, (1, 0, 2)).reshape(nq, -1)
        alli = jnp.transpose(g_ti, (1, 0, 2)).reshape(nq, -1)
        tv, tpos = jax.lax.top_k(allv, k_out)
        tidx = jnp.take_along_axis(alli, tpos, axis=1)
        return tv[None], tidx[None]

    sm = shard_map_compat(local, mesh,
                          in_specs=(P(axis), P(axis)),
                          out_specs=(P(axis), P(axis)))
    return jax.jit(sm)


def merge_topk_sharded(mesh, axis: str,
                       shard_scores: List[np.ndarray],
                       shard_tidx: List[np.ndarray],
                       top_b: int) -> List[List[Tuple[int, int]]]:
    """Merge per-shard top-B lists into global per-query top-B.

    shard_scores[d]: int32 [nq, <=B] local top list of mesh device d
    (score-descending, ties by ascending target index — the native
    prefilter + host RankedScoresBag order); shard_tidx[d] holds GLOBAL
    target indices.  Shards must cover contiguous ascending target
    ranges.  Returns per query a list of (target, score), like
    PrefilterResult.query_targets.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    assert len(shard_scores) == n_dev
    nq = shard_scores[0].shape[0]
    b_local = max(max((s.shape[1] for s in shard_scores), default=1), 1)

    sv = np.full((n_dev, nq, b_local), PAD_SCORE, np.int32)
    ti = np.full((n_dev, nq, b_local), np.int32(2**31 - 1), np.int32)
    for d in range(n_dev):
        b = shard_scores[d].shape[1]
        sv[d, :, :b] = shard_scores[d]
        ti[d, :, :b] = shard_tidx[d]

    fn = _merge_fn(mesh, axis, nq, b_local, top_b)
    sh = NamedSharding(mesh, P(axis))
    tv, tidx = fn(jax.device_put(jnp.asarray(sv), sh),
                  jax.device_put(jnp.asarray(ti), sh))
    # every shard holds the identical merged result; read shard 0's slice
    tv = np.asarray(tv[0])
    tidx = np.asarray(tidx[0])
    out: List[List[Tuple[int, int]]] = []
    for qi in range(nq):
        keep = tv[qi] > PAD_SCORE
        out.append([(int(t), int(s))
                    for t, s in zip(tidx[qi][keep], tv[qi][keep])])
    return out


def merge_topk_distributed(mesh, axis: str,
                           local_scores: List[np.ndarray],
                           local_tidx: List[np.ndarray],
                           top_b: int) -> List[List[Tuple[int, int]]]:
    """Multi-controller variant of merge_topk_sharded: each PROCESS passes
    only the shards of its own addressable mesh devices (in mesh order);
    the collective all-gather runs over the global mesh, so every process
    returns the identical global per-query top-B.

    All shards must be padded to exactly [nq, top_b] (PAD_SCORE /
    2^31-1), because processes cannot negotiate a common b_local.  With a
    single process this reduces to merge_topk_sharded semantics.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_local = len(local_scores)
    assert n_local >= 1
    nq, b = local_scores[0].shape
    assert b == top_b, f"shards must be padded to top_b ({b} != {top_b})"
    n_dev = mesh.devices.size
    sh = NamedSharding(mesh, P(axis))
    loc_sv = np.stack(local_scores).astype(np.int32)
    loc_ti = np.stack(local_tidx).astype(np.int32)
    gshape = (n_dev, nq, top_b)
    sv = jax.make_array_from_process_local_data(sh, loc_sv, gshape)
    ti = jax.make_array_from_process_local_data(sh, loc_ti, gshape)
    fn = _merge_fn(mesh, axis, nq, top_b, top_b)
    tv, tidx = fn(sv, ti)
    tv = np.asarray(tv.addressable_data(0))[0]
    tidx = np.asarray(tidx.addressable_data(0))[0]
    out: List[List[Tuple[int, int]]] = []
    for qi in range(nq):
        keep = tv[qi] > PAD_SCORE
        out.append([(int(t), int(s))
                    for t, s in zip(tidx[qi][keep], tv[qi][keep])])
    return out


def pad_topk_lists(query_targets, nq: int, top_b: int):
    """PrefilterResult.query_targets -> padded ([nq, top_b] scores,
    [nq, top_b] global target idx) for the distributed merge."""
    sv = np.full((nq, top_b), PAD_SCORE, np.int32)
    ti = np.full((nq, top_b), np.int32(2**31 - 1), np.int32)
    for qi, lst in enumerate(query_targets):
        for k, (t, s) in enumerate(lst[:top_b]):
            sv[qi, k] = s
            ti[qi, k] = t
    return sv, ti


def sharded_prefilter_search(query_mu, target_mu_list, mesh,
                             axis: str = "db", top_b: int = 1500,
                             mode=None, ascii_roundtrip: bool = True):
    """DB-sharded prefilter: split targets into contiguous shards (one per
    mesh device; per-HOST shards in a multi-host deployment), scan each
    with the native prefilter, then merge per-query top-B lists with the
    device collective.  Selection is identical to the single-shard
    prefilter_search (RankedScoresBag semantics) — asserted in tests.
    """
    from reseek_tpu.search.prefilter import MuPrefilter, PrefilterResult

    n_dev = mesh.devices.size
    nt = len(target_mu_list)
    nq = len(query_mu)
    bounds = np.linspace(0, nt, n_dev + 1).astype(np.int64)
    shard_scores, shard_tidx = [], []
    for d in range(n_dev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        pf = MuPrefilter(query_mu, top_b=top_b, mode=mode,
                         ascii_roundtrip=ascii_roundtrip)
        mus = [np.asarray(m, np.uint8) for m in target_mu_list[lo:hi]]
        if mus:
            pf.add_targets(mus, list(range(lo, hi)))
        res = pf.finish()
        sv = np.full((nq, top_b), PAD_SCORE, np.int32)
        ti = np.full((nq, top_b), np.int32(2**31 - 1), np.int32)
        for qi, lst in enumerate(res.query_targets):
            for k, (t, s) in enumerate(lst[:top_b]):
                sv[qi, k] = s
                ti[qi, k] = t
        shard_scores.append(sv)
        shard_tidx.append(ti)
    merged = merge_topk_sharded(mesh, axis, shard_scores, shard_tidx,
                                top_b)
    return PrefilterResult(query_targets=merged)
