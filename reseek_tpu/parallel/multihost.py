"""Multi-host deployment orchestration (SURVEY §2.8 items 2-3).

The reference is single-node (std::thread only); scaling past one host
here follows the standard JAX multi-controller recipe:

  1. every host runs the same program and calls `init_distributed()`
     (jax.distributed — coordinator address/rank from env or args);
  2. each host loads only ITS contiguous shard of the target DB
     (`host_shard_bounds`), encodes it locally (native encoder), and
     scans it with the native prefilter;
  3. per-query top-B candidate lists merge with the device collective in
     reseek_tpu/parallel/topk.py (all_gather + top_k over the global
     mesh, RankedScoresBag tie-break), so every host ends up with the
     identical global selection;
  4. stage-2 alignment of the survivors that live in the host's shard
     runs locally; process 0 concatenates row files (hits are emitted
     per target in ascending global index, so a simple ordered merge of
     per-host outputs reproduces the single-host row order).

On this runner only one process/chip exists, so `distributed_prefilter`
is exercised in CI with n_processes=1 plus the 8-virtual-device mesh
(degenerate but running the same code path, including the collective
merge); tests/test_topk.py asserts mesh-vs-single selection parity.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed (no-op for a single process).  Returns
    (process_id, num_processes)."""
    import jax
    if num_processes is None or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_shard_bounds(n_targets: int, process_id: int,
                      num_processes: int) -> Tuple[int, int]:
    """Contiguous [lo, hi) target range owned by this host.  Contiguity
    matters: the top-B merge's tie-break relies on shards covering
    ascending global index ranges (parallel/topk.py)."""
    bounds = np.linspace(0, n_targets, num_processes + 1).astype(np.int64)
    return int(bounds[process_id]), int(bounds[process_id + 1])


def distributed_prefilter(query_mu, target_mu_shard, shard_lo: int,
                          mesh, axis: str = "db", top_b: int = 1500,
                          mode=None, ascii_roundtrip: bool = True):
    """This host's prefilter scan over its shard + the global collective
    merge.  target_mu_shard holds the Mu letters of targets
    [shard_lo, shard_lo + len) only; the returned PrefilterResult holds
    the GLOBAL per-query top-B (identical on every host).

    With one process and an n-device mesh, the shard is subdivided
    across the mesh devices (the same path a multi-host run takes with
    one device per host)."""
    from reseek_tpu.parallel.topk import PAD_SCORE, merge_topk_sharded
    from reseek_tpu.search.prefilter import MuPrefilter, PrefilterResult

    n_dev = mesh.devices.size
    nq = len(query_mu)
    nt = len(target_mu_shard)
    bounds = np.linspace(0, nt, n_dev + 1).astype(np.int64)
    shard_scores, shard_tidx = [], []
    for d in range(n_dev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        pf = MuPrefilter(query_mu, top_b=top_b, mode=mode,
                         ascii_roundtrip=ascii_roundtrip)
        mus = [np.asarray(m, np.uint8) for m in target_mu_shard[lo:hi]]
        if mus:
            pf.add_targets(mus, list(range(shard_lo + lo, shard_lo + hi)))
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
