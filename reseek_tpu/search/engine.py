"""Batched TPU search engine.

Design constraints (measured on the round-1 runner):
  - device->host fetches: ~40 ms latency, 3-16 MB/s  -> fetch only tiny
    score/path arrays, never traceback tensors
  - host->device uploads: fast (~80 MB/s)            -> DB uploaded once,
    per-batch index vectors and LDDT coords uploaded freely
  - XLA compiles through the tunnel: minutes          -> few fixed shapes
    (square length buckets, one fixed batch size per bucket), persistent
    compilation cache

Pipeline stages (pair pipeline of src/dssaligner.cpp over batches):
  stage 1  Mu filter:  fwd+rev 36-letter SW and Omega gating on device
  stage 2  full SW score (bit-exact gathered substitution matrix)
  stage 3  traceback alignment: SW + on-device backward walk -> lo/path
  stage 4  LDDT on device from uploaded aligned-column coords; TS/E host
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from reseek_tpu.align.pipeline import AlignResult, EncodedChain
from reseek_tpu.constants import DSSParams, StatSig
from reseek_tpu.data.tables import get_tables

DEFAULT_BUCKETS = (96, 192, 384, 768, 1536, 3072)
CELL_BUDGET = 1 << 26  # B * L * L cells per device batch
PAD_BYTE = 255         # profile pad marker in device uint8 arrays


def configure_jax() -> None:
    """Enable the persistent compilation cache (tunnel compiles are slow)."""
    import jax
    cache_dir = os.environ.get(
        "RESEEK_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bucket_for(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


MAX_BATCH = 2048  # larger batches make remote XLA compiles pathological


def batch_size_for(bucket: int) -> int:
    return max(1, min(MAX_BATCH, CELL_BUDGET // (bucket * bucket)))


def _kernels():
    """Kernel set for the currently-selected SW implementation.  The env
    var is re-read on every call; the cache is keyed on the resolved
    implementation so toggling RESEEK_SW mid-process takes effect."""
    import jax
    impl = os.environ.get("RESEEK_SW", "auto")
    use_pallas = (impl == "pallas" or
                  (impl == "auto" and jax.default_backend() == "tpu"))
    return _kernels_for(use_pallas)


@functools.lru_cache(maxsize=None)
def _kernels_for(use_pallas: bool):
    import jax
    import jax.numpy as jnp
    from reseek_tpu.ops.postalign_jax import lddt_batch, walk_traceback_batch

    # Pallas wavefront kernels (DP state in VMEM) on TPU; the lax.scan
    # wavefront elsewhere.  Both are bit-identical to ops/sw_np.py.
    if use_pallas:
        from reseek_tpu.ops.sw_pallas import (
            sw_score_pallas as sw_score_batch,
            sw_traceback_pallas as sw_traceback_batch)
    else:
        from reseek_tpu.ops.sw_jax import sw_score_batch, sw_traceback_batch

    def codes_slice(prof_db, idx, offsets, pad_code, bucket):
        """Gather + slice + flat-code profiles: [B, F, bucket] int32."""
        p = prof_db[idx][:, :, :bucket].astype(jnp.int32)
        return jnp.where(p == PAD_BYTE, pad_code,
                         p + offsets[None, :, None])

    def smx(codes_a, codes_b, w):
        """S[b,i,j] = sum_f w[ca[b,f,i], cb[b,f,j]] via one-hot MXU
        matmuls.  TPU [B,L,L] table gathers cost ~15 ns/element (measured
        on the round-1 runner) — two matmuls are orders of magnitude
        faster.  HIGHEST precision keeps ~f32 accuracy (<=1e-6 deviation
        from feature-ordered f32 adds)."""
        d = w.shape[0]

        def multihot(codes):
            # accumulate per feature to avoid materializing [B, F, L, D]
            out = jax.nn.one_hot(codes[:, 0], d, dtype=jnp.float32)
            for f in range(1, codes.shape[1]):
                out = out + jax.nn.one_hot(codes[:, f], d, dtype=jnp.float32)
            return out

        oh_a = multihot(codes_a)
        oh_b = multihot(codes_b)
        emb = jax.lax.dot_general(
            oh_a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # [B, L, D]
        return jax.lax.dot_general(
            emb, oh_b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)

    def mu_smx(a, b, mumx):
        """Mu substitution matrix via one-hot matmul.  The int8 Mu matrix
        values (-7..4) are exact in bf16 and accumulate exactly in f32, so
        this equals the table lookup bit-for-bit."""
        oh_a = jax.nn.one_hot(a, 37, dtype=jnp.bfloat16)
        oh_b = jax.nn.one_hot(b, 37, dtype=jnp.bfloat16)
        emb = jax.lax.dot_general(
            oh_a, mumx.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            emb.astype(jnp.bfloat16), oh_b,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def stage1_mu(mu_db, mu_rev_db, idx_a, idx_b, mumx, omega_fwd,
                  bucket, open_, ext):
        a = mu_db[idx_a][:, :bucket].astype(jnp.int32)
        ar = mu_rev_db[idx_a][:, :bucket].astype(jnp.int32)
        b = mu_db[idx_b][:, :bucket].astype(jnp.int32)
        fwd = sw_score_batch(mu_smx(a, b, mumx), open_, ext)
        rev = sw_score_batch(mu_smx(ar, b, mumx), open_, ext)
        return jnp.where(fwd < omega_fwd, np.float32(0.0), fwd - rev)

    def stage2_full(prof_a_db, prof_b_db, idx_a, idx_b, w, offsets,
                    pad_code, bucket, open_, ext):
        ca = codes_slice(prof_a_db, idx_a, offsets, pad_code, bucket)
        cb = codes_slice(prof_b_db, idx_b, offsets, pad_code, bucket)
        return sw_score_batch(smx(ca, cb, w), open_, ext)

    def stage3_align(prof_db, idx_a, idx_b, w, offsets, pad_code, bucket,
                     open_, ext):
        ca = codes_slice(prof_db, idx_a, offsets, pad_code, bucket)
        cb = codes_slice(prof_db, idx_b, offsets, pad_code, bucket)
        best, bi, bj, tbs = sw_traceback_batch(smx(ca, cb, w), open_, ext)
        lo_a, lo_b, plen, path_rev = walk_traceback_batch(tbs, best, bi, bj)
        return best, lo_a, lo_b, plen, path_rev

    def stage4_lddt(cq, ct, valid, ncols):
        return lddt_batch(cq, ct, valid, ncols)

    return {
        "stage1_mu": jax.jit(
            stage1_mu,
            static_argnames=("omega_fwd", "bucket", "open_", "ext")),
        "stage2_full": jax.jit(
            stage2_full,
            static_argnames=("pad_code", "bucket", "open_", "ext")),
        "stage3_align": jax.jit(
            stage3_align,
            static_argnames=("pad_code", "bucket", "open_", "ext")),
        "stage4_lddt": jax.jit(stage4_lddt),
    }


def _mu_matrix_padded() -> np.ndarray:
    m = np.full((37, 37), np.float32(-9e9) / 2, np.float32)
    m[:36, :36] = get_tables().mu_score_mx_int8.astype(np.float32)
    return m


class DeviceDB:
    """Encoded chains resident on device.

    Host keeps EncodedChain list (coords, labels, profiles); the device
    holds uint8 profile/Mu arrays padded to a single Lmax, gathered and
    sliced per batch on device.
    """

    def __init__(self, ecs: List[EncodedChain], params: DSSParams,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 with_rev_profiles: bool = True):
        import jax.numpy as jnp
        from reseek_tpu.encoder.dss import encode_chain
        from reseek_tpu.ops.smx_jax import flat_layout

        self.ecs = ecs
        self.params = params
        offsets, d, w = flat_layout(params.features, params.weights)
        self.offsets = jnp.asarray(offsets.astype(np.int32))
        self.pad_code = int(d)
        self.w = jnp.asarray(w)
        self.mumx = jnp.asarray(_mu_matrix_padded())

        lens = np.array([len(ec) for ec in ecs])
        lmax = int(lens.max()) if len(lens) else 1
        if lmax > buckets[-1]:
            # chains longer than the largest preset bucket (possible in
            # verysensitive mode, where MKF routing is off) get a final
            # bucket rounded up to 256 — never silently truncated
            self.lmax = -(-lmax // 256) * 256
        else:
            self.lmax = bucket_for(lmax, buckets)
        self.buckets = tuple(b for b in buckets if b <= self.lmax)
        if not self.buckets or self.buckets[-1] < self.lmax:
            self.buckets = tuple(self.buckets) + (self.lmax,)

        n = len(ecs)
        nf = len(params.features)
        prof = np.full((n, nf, self.lmax), PAD_BYTE, np.uint8)
        mu = np.full((n, self.lmax), 36, np.uint8)
        mu_rev = np.full((n, self.lmax), 36, np.uint8)
        for i, ec in enumerate(ecs):
            L = min(len(ec), self.lmax)
            prof[i, :, :L] = ec.profile[:, :L]
            mu[i, :L] = ec.mu_letters[:L]
            mu_rev[i, :L] = ec.mu_letters[:L][::-1]
        self.prof = jnp.asarray(prof)
        self.mu = jnp.asarray(mu)
        self.mu_rev = jnp.asarray(mu_rev)

        self.prof_rev = None
        if with_rev_profiles:
            prof_rev = np.full((n, nf, self.lmax), PAD_BYTE, np.uint8)
            for i, ec in enumerate(ecs):
                L = min(len(ec), self.lmax)
                rp = encode_chain(ec.chain.reversed()).profile(params)
                prof_rev[i, :, :L] = rp[:, :L]
            self.prof_rev = jnp.asarray(prof_rev)


class BatchedEngine:
    def __init__(self, db: DeviceDB):
        self.db = db
        self.params = db.params
        self.k = _kernels()

    # -- batching ------------------------------------------------------
    def _bucketed(self, pairs: np.ndarray
                  ) -> Iterator[Tuple[int, np.ndarray, int, np.ndarray]]:
        if len(pairs) == 0:
            return
        lens = np.array([len(ec) for ec in self.db.ecs])
        maxlen = np.minimum(np.maximum(lens[pairs[:, 0]], lens[pairs[:, 1]]),
                            self.db.lmax)
        edges = np.asarray(self.db.buckets)
        pb = edges[np.minimum(np.searchsorted(edges, maxlen),
                              len(edges) - 1)]
        for b in sorted(set(pb.tolist())):
            rows_all = np.flatnonzero(pb == b)
            bs = batch_size_for(b)
            for kk in range(0, len(rows_all), bs):
                rows = rows_all[kk: kk + bs]
                chunk = pairs[rows]
                n = len(chunk)
                if n < bs:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], bs - n, axis=0)])
                yield b, chunk, n, rows

    # -- stages --------------------------------------------------------
    def mu_filter_scores(self, pairs: np.ndarray) -> np.ndarray:
        """Filter value per pair: 0 if fwd < OmegaFwd else fwd - rev
        (src/parasail_mu.cpp:120-161).  Single fetch at the end."""
        import jax.numpy as jnp
        p = self.params
        o, e = -float(p.para_mu_gap_open), -float(p.para_mu_gap_ext)
        chunks = []
        rows_list = []
        for bucket, chunk, n, rows in self._bucketed(pairs):
            sc = self.k["stage1_mu"](
                self.db.mu, self.db.mu_rev,
                jnp.asarray(chunk[:, 0]), jnp.asarray(chunk[:, 1]),
                self.db.mumx, float(p.omega_fwd), bucket, o, e)
            chunks.append(sc[:n])
            rows_list.append(rows)
        if not chunks:
            return np.zeros(0, np.float32)
        allsc = np.asarray(jnp.concatenate(chunks))  # one fetch
        out = np.zeros(len(pairs), np.float32)
        out[np.concatenate(rows_list)] = allsc
        return out

    def full_scores(self, pairs: np.ndarray,
                    b_side_rev: bool = False) -> np.ndarray:
        """Stage-2 SW scores; with b_side_rev the target profile array is
        the reversed-chain encodes (used for self-reversal scores)."""
        import jax.numpy as jnp
        p = self.params
        prof_b = self.db.prof_rev if b_side_rev else self.db.prof
        chunks = []
        rows_list = []
        for bucket, chunk, n, rows in self._bucketed(pairs):
            sc = self.k["stage2_full"](
                self.db.prof, prof_b,
                jnp.asarray(chunk[:, 0]), jnp.asarray(chunk[:, 1]),
                self.db.w, self.db.offsets, self.db.pad_code, bucket,
                float(p.gap_open), float(p.gap_ext))
            chunks.append(sc[:n])
            rows_list.append(rows)
        if not chunks:
            return np.zeros(0, np.float32)
        allsc = np.asarray(jnp.concatenate(chunks))
        out = np.zeros(len(pairs), np.float32)
        out[np.concatenate(rows_list)] = allsc
        return out

    def self_rev_scores(self) -> np.ndarray:
        """GetSelfRevScore per chain (src/alignpair.cpp:7-25), batched."""
        n = len(self.db.ecs)
        pairs = np.stack([np.arange(n), np.arange(n)], axis=1)
        return self.full_scores(pairs, b_side_rev=True)

    def full_alignments(self, pairs: np.ndarray) -> List[AlignResult]:
        """Stage 3+4: paths on device, LDDT on device, TS/P/E on host."""
        import jax.numpy as jnp
        from reseek_tpu.ops.postalign_jax import PD, PI, PM
        p = self.params
        results: List[Optional[AlignResult]] = [None] * len(pairs)
        per_batch = []
        for bucket, chunk, n, rows in self._bucketed(pairs):
            best, lo_a, lo_b, plen, path_rev = self.k["stage3_align"](
                self.db.prof, jnp.asarray(chunk[:, 0]),
                jnp.asarray(chunk[:, 1]), self.db.w, self.db.offsets,
                self.db.pad_code, bucket,
                float(p.gap_open), float(p.gap_ext))
            per_batch.append((bucket, chunk, n, rows, best, lo_a, lo_b,
                              plen, path_rev))

        code_char = {PM: "M", PD: "D", PI: "I"}
        lddt_jobs = []
        for (bucket, chunk, n, rows, best, lo_a, lo_b, plen,
             path_rev) in per_batch:
            best = np.asarray(best)
            lo_a = np.asarray(lo_a)
            lo_b = np.asarray(lo_b)
            plen = np.asarray(plen)
            path_rev = np.asarray(path_rev)
            batch_results = []
            m_bucket = bucket  # max aligned columns
            cq = np.zeros((len(chunk), m_bucket, 3), np.float32)
            ct = np.zeros((len(chunk), m_bucket, 3), np.float32)
            valid = np.zeros((len(chunk), m_bucket), bool)
            ncols = np.zeros(len(chunk), np.int32)
            for kk in range(n):
                qi, ti = int(chunk[kk, 0]), int(chunk[kk, 1])
                q, t = self.db.ecs[qi], self.db.ecs[ti]
                res = AlignResult(query=q.label, target=t.label,
                                  fwd_score=float(best[kk]))
                if best[kk] > 0:
                    codes = path_rev[kk, : plen[kk]][::-1]
                    res.path = "".join(code_char[c] for c in codes)
                    res.lo_a = int(lo_a[kk])
                    res.lo_b = int(lo_b[kk])
                    if res.fwd_score >= p.min_fwd_score:
                        is_m = codes == PM
                        adv_a = (codes != PI).astype(np.int64)
                        adv_b = (codes != PD).astype(np.int64)
                        pos_a = res.lo_a + np.cumsum(adv_a) - adv_a
                        pos_b = res.lo_b + np.cumsum(adv_b) - adv_b
                        pq = pos_a[is_m]
                        pt = pos_b[is_m]
                        m = len(pq)
                        cq[kk, :m] = q.chain.coords[pq]
                        ct[kk, :m] = t.chain.coords[pt]
                        valid[kk, :m] = True
                        ncols[kk] = m
                batch_results.append(res)
            lddt_dev = self.k["stage4_lddt"](
                jnp.asarray(cq), jnp.asarray(ct), jnp.asarray(valid),
                jnp.asarray(ncols))
            lddt_jobs.append((batch_results, chunk, n, rows, lddt_dev))

        for batch_results, chunk, n, rows, lddt_dev in lddt_jobs:
            lddt = np.asarray(lddt_dev)
            for kk in range(n):
                res = batch_results[kk]
                qi, ti = int(chunk[kk, 0]), int(chunk[kk, 1])
                q, t = self.db.ecs[qi], self.db.ecs[ti]
                if res.path and res.fwd_score >= self.params.min_fwd_score:
                    _finish_from_lddt(res, q, t, self.params,
                                      float(lddt[kk]))
                results[rows[kk]] = res
        return results


def _finish_from_lddt(res: AlignResult, q: EncodedChain, t: EncodedChain,
                      p: DSSParams, lddt: float) -> None:
    """TS/P/E from a precomputed LDDT, float32 order of
    src/dssaligner.cpp:852-904."""
    from reseek_tpu.align.pipeline import FLT_MAX
    from reseek_tpu.constants import (TS_DP_WEIGHT, TS_L_ADD, TS_LDDT_WEIGHT,
                                      TS_REV_WEIGHT)
    n_m = res.path.count("M")
    n_d = res.path.count("D")
    n_i = res.path.count("I")
    res.hi_a = res.lo_a + n_m + n_d - 1
    res.hi_b = res.lo_b + n_m + n_i - 1
    res.ids = n_m
    res.gaps = n_d + n_i
    res.lddt = lddt
    sa, sb = q.self_rev_score, t.self_rev_score
    if sa != FLT_MAX and sb != FLT_MAX:
        rev_dp = np.float32(np.float32(sa) + np.float32(sb)) / np.float32(2)
    else:
        rev_dp = np.float32(0.0)
    L = np.float32(float(len(q) + len(t))) / np.float32(2)
    ts = np.float32(TS_LDDT_WEIGHT) * np.float32(res.lddt)
    ts = np.float32(ts + (np.float32(TS_DP_WEIGHT) * np.float32(res.fwd_score)
                          - np.float32(TS_REV_WEIGHT) * rev_dp)
                    / (L + np.float32(TS_L_ADD)))
    res.ts = float(ts)
    res.pvalue = StatSig.pvalue(res.ts)
    res.evalue = StatSig.evalue(res.ts)
    res.qual = StatSig.qual(res.ts)


# Back-compat alias used by engine tests / finishers
def finish_result(res: AlignResult, q: EncodedChain, t: EncodedChain,
                  p: DSSParams) -> None:
    from reseek_tpu.align.pipeline import _path_positions
    from reseek_tpu.ops.lddt import lddt_mu_fast
    if res.fwd_score < p.min_fwd_score:
        return
    pos_q, pos_t = _path_positions(res.lo_a, res.lo_b, res.path)
    lddt = lddt_mu_fast(q.chain.coords, t.chain.coords, pos_q, pos_t)
    _finish_from_lddt(res, q, t, p, lddt)


def batched_self_search(ecs: List[EncodedChain], params: DSSParams,
                        max_evalue: float = 10.0,
                        db: Optional[DeviceDB] = None,
                        skip_pair=None,
                        skipped: Optional[list] = None,
                        kept_pairs: Optional[list] = None
                        ) -> List[AlignResult]:
    """All-vs-all via the staged device pipeline (pair emitted once).

    skip_pair(i, j) -> True routes a pair away from the device engine
    (collected into `skipped`, e.g. for the host MKF long-chain path).
    When kept_pairs is given it receives the (i, j) tuple of each
    returned result, in result order."""
    if db is None:
        db = DeviceDB(ecs, params, with_rev_profiles=False)
    eng = BatchedEngine(db)
    n = len(ecs)
    iu = np.triu_indices(n)
    pairs = np.stack(iu, axis=1).astype(np.int64)
    if skip_pair is not None:
        mask = np.array([skip_pair(int(i), int(j)) for i, j in pairs])
        if skipped is not None:
            skipped.extend((int(i), int(j)) for i, j in pairs[mask])
        pairs = pairs[~mask]
    if params.omega > 0:
        mu = eng.mu_filter_scores(pairs)
        pairs = pairs[mu >= params.omega]
    if len(pairs) == 0:
        return []
    fwd = eng.full_scores(pairs)
    pairs = pairs[fwd >= params.min_fwd_score]
    if len(pairs) == 0:
        return []
    results = eng.full_alignments(pairs)
    out = []
    for pr, r in zip(pairs, results):
        if r is not None and r.path and r.evalue <= max_evalue:
            out.append(r)
            if kept_pairs is not None:
                kept_pairs.append((int(pr[0]), int(pr[1])))
    return out
