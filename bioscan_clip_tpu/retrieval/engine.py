"""On-TPU exact inner-product top-k retrieval — the FAISS IndexFlatIP
replacement (reference: scripts/inference_and_eval.py:414-445,
epoch/eval_epoch.py:153-154, util/util.py:159-169; faiss-gpu in
requirements.txt:22).

Design (TPU-first):
- similarities are tiled MXU matmuls `Q @ K.T` streamed over key chunks with
  a running top-k merge (`jax.lax.scan` + `jax.lax.top_k`), so HBM holds at
  most (Bq, key_chunk) scores — key sets up to the BIOSCAN-5M scale never
  materialize a full similarity matrix;
- multi-device: keys are sharded over the mesh's `data` axis inside
  `shard_map`; each device computes its local top-k, then the (Bq, k)
  candidates are all-gathered (tiny) and merged to the exact global top-k;
- queries are L2-normalized like the reference (sklearn normalize,
  inference_and_eval.py:416-417) so inner product == cosine.

`make_prediction` reproduces the reference API: per-query dicts of top-k
label lists for each taxonomic level.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bioscan_clip_tpu.parallel.mesh import DATA_AXIS

LEVELS = ["order", "family", "genus", "species"]


def l2norm_np(x, eps=1e-12):
    """sklearn normalize(norm='l2') parity: zero rows stay zero."""
    x = np.asarray(x, dtype=np.float32)
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, eps)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("k", "key_chunk", "axis_name", "precision"),
)
def _topk_scan(queries, keys, n_valid, k: int, key_chunk: int,
               axis_name=None, precision=None):
    """Exact top-k of queries @ keys.T by streaming key chunks.

    queries: (B, D) f32; keys: (N_pad, D) f32. Rows with index >= n_valid
    are padding and are masked to -inf before the merge so they can never
    displace a real (possibly negative-similarity) key.
    """
    B, D = queries.shape
    N = keys.shape[0]
    n_chunks = N // key_chunk
    keys_c = keys.reshape(n_chunks, key_chunk, D)

    init_vals = jnp.full((B, k), -jnp.inf, jnp.float32)
    init_idx = jnp.zeros((B, k), jnp.int32)
    if axis_name is not None:
        # under shard_map the carry interacts with axis-varying values; mark
        # the init carry as varying over the mesh axis
        init_vals = jax.lax.pcast(init_vals, (axis_name,), to="varying")
        init_idx = jax.lax.pcast(init_idx, (axis_name,), to="varying")

    def body(carry, inp):
        vals, idxs = carry
        chunk, cidx = inp
        sims = jnp.dot(
            queries, chunk.T, preferred_element_type=jnp.float32,
            precision=(
                None if precision is None
                else getattr(jax.lax.Precision, precision.upper())
            ),
        )  # (B, C)
        local_idx = (
            jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
            + cidx * key_chunk
        )
        sims = jnp.where(local_idx < n_valid, sims, -jnp.inf)
        cat_vals = jnp.concatenate([vals, sims], axis=1)
        cat_idx = jnp.concatenate([idxs, local_idx], axis=1)
        new_vals, sel = jax.lax.top_k(cat_vals, k)
        new_idx = jnp.take_along_axis(cat_idx, sel, axis=1)
        return (new_vals, new_idx), None

    (vals, idxs), _ = jax.lax.scan(
        body,
        (init_vals, init_idx),
        (keys_c, jnp.arange(n_chunks, dtype=jnp.int32)),
    )
    return vals, idxs


# Key-tile width of the fused top-k kernel. 2048 beats 512 ~3x at int8
# (20.2 ms vs ~60 ms per 1024 queries x 1M keys) and leaves fp32-HIGHEST
# within 1.13x of its 6-pass MXU structural floor: wider tiles mean 4x
# fewer grid steps, so the per-step scalar-core/DMA orchestration and the
# merge's full-width passes amortize (BENCH_TOPK_r05.jsonl decomposition;
# needs the raised Mosaic VMEM ceiling, ops/topk_pallas._vmem_params).
PALLAS_TILE = 2048
# Query rows per kernel block. 256 is the sweet spot: 512 regressed the
# full top-k kernels 3-6x (VREG spill in the merge's full-width ops)
# even though the mm-only control improved — see BENCH_TOPK_r05.
Q_BLOCK = 256


def _device_budget_keys(d: int, mesh, streaming_halved: bool = False,
                        bytes_per_elem: int = 4) -> int:
    """Key rows per device: 37.5% of the device's HBM when it reports
    a limit (leaves room for queries, padding, scores, kernel workspace),
    else ~6 GB (the v5e 16 GB assumption). Halved when double-buffered
    streaming keeps TWO slabs resident. `bytes_per_elem`: 4 for fp32 keys,
    1 for int8-quantized keys (4x the resident capacity — BIOSCAN-5M's
    5M x 768 key set fits one 16 GB chip entirely)."""
    budget_bytes = 6e9
    try:
        dev = mesh.devices.flat[0] if mesh is not None else jax.devices()[0]
        ms = dev.memory_stats()
        if ms and ms.get("bytes_limit"):
            budget_bytes = 0.375 * float(ms["bytes_limit"])
    except Exception:
        pass
    if streaming_halved:
        budget_bytes /= 2
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    return int(budget_bytes / (bytes_per_elem * d)) * n_dev


class PreparedKeys:
    """Key matrix prepared ONCE for repeated top-k searches: padded to the
    device/kernel layout and uploaded (device-resident case), or held on
    host for slab streaming (> HBM case). Reusing a PreparedKeys across an
    eval sweep's 5 query types skips 4 of the 5 multi-GB uploads
    (VERDICT r2 weak #4).

    `precision="int8"`: keys are stored device-resident as symmetric
    per-row int8 codes + f32 scales — 4x the resident capacity (the
    BIOSCAN-5M 5M x 768 key set drops from 15.4 GB fp32, which must be
    host-streamed in slabs, to 3.8 GB fully resident on a 16 GB chip) and
    4x less HBM read per search. The kernel's tile scores are EXACT integer
    dot products times the scales (ops/topk_pallas.py `_topk_i8_kernel`);
    candidates are oversampled and re-scored in fp32 against the host key
    matrix, so the final top-k is exact whenever the true k-th neighbor
    survives quantized ranking into the oversampled pool
    (tests/test_int8_retrieval.py bounds the recall)."""

    def __init__(self, keys, mesh=None, key_chunk: int = 65536,
                 use_pallas: Optional[bool] = None,
                 max_device_keys: Optional[int] = None,
                 precision: str = "high", normalized: bool = False,
                 rescore: str = "float32"):
        ks = np.asarray(keys, dtype=np.float32)
        if not normalized:
            ks = l2norm_np(ks)
        self.n_keys, self.d = ks.shape
        self.mesh = mesh
        self.precision = precision
        self.int8 = precision == "int8"
        # int8 host-rescore storage: "float32" (exact scores, 4 B/elem of
        # host RAM), "bfloat16" (half the host RAM; scores carry the keys'
        # bf16 representation error ~1e-3 relative, ranking can flip exact
        # near-ties), "none" (zero host RAM; returned scores/ranking are
        # the quantized kernel scores — exact integer dots x scales)
        if rescore not in ("float32", "bfloat16", "none"):
            raise ValueError(f"unknown rescore mode {rescore!r}")
        self.rescore = rescore
        self.n_dev = 1
        if mesh is not None:
            self.n_dev = int(
                np.prod([mesh.shape[a] for a in mesh.axis_names])
            )
        self.streaming = False
        self.host_keys = None
        self.max_device_keys = max_device_keys
        bpe = 1 if self.int8 else 4
        if max_device_keys is None:
            resident_budget = _device_budget_keys(
                self.d, mesh, bytes_per_elem=bpe
            )
            if self.n_keys > resident_budget:
                # double-buffered streaming keeps 2 slabs resident
                self.max_device_keys = _device_budget_keys(
                    self.d, mesh, streaming_halved=True, bytes_per_elem=bpe
                )
            else:
                self.max_device_keys = resident_budget
        if self.n_keys > self.max_device_keys:
            # host-streamed slabs: the fp32 rows ARE the stream source, so
            # they stay resident regardless of the rescore storage mode
            self.streaming = True
            self.host_keys = ks
            self.use_pallas = use_pallas
            self.key_chunk = key_chunk
            return

        if self.int8:
            from bioscan_clip_tpu.ops.topk_pallas import quantize_rows_i8

            # int8 search runs through the Pallas kernel (interpreted
            # off-TPU); the rescore pass reads host rows in the configured
            # storage dtype (float32 exact / bfloat16 half-RAM / none)
            self.use_pallas = True
            self.host_keys = self._rescore_rows(ks)
            shard = -(-self.n_keys // self.n_dev)
            self.shard_pad = _round_up(shard, PALLAS_TILE)
            self.key_chunk = key_chunk
            codes, scales = quantize_rows_i8(ks)
            n_pad = self.shard_pad * self.n_dev
            codes_p = np.zeros((n_pad, self.d), np.int8)
            codes_p[: self.n_keys] = codes
            scales_p = np.ones((1, n_pad), np.float32)
            scales_p[0, : self.n_keys] = scales[:, 0]
            if self.n_dev > 1:
                # codes sharded over key rows, scales over the lane axis —
                # each device holds its shard's (shard_pad, D) codes +
                # (1, shard_pad) scales; the sharded searcher merges local
                # top-ks exactly (same shard_map pattern as fp32 keys)
                self.keys_dev = jax.device_put(
                    codes_p, NamedSharding(mesh, P(DATA_AXIS, None))
                )
                self.key_scales_dev = jax.device_put(
                    scales_p, NamedSharding(mesh, P(None, DATA_AXIS))
                )
            else:
                self.keys_dev = jnp.asarray(codes_p)
                self.key_scales_dev = jnp.asarray(scales_p)
            return

        if use_pallas is None:
            use_pallas = (
                jax.default_backend() == "tpu"
                and self.n_keys >= 100_000 * self.n_dev
            )
        self.use_pallas = use_pallas
        # pad keys so each device shard divides into whole chunks/tiles
        shard = -(-self.n_keys // self.n_dev)
        if use_pallas:
            shard_pad = _round_up(shard, PALLAS_TILE)
        else:
            key_chunk = min(key_chunk, _round_up(shard, 8))
            shard_pad = _round_up(shard, key_chunk)
        self.key_chunk = key_chunk
        self.shard_pad = shard_pad
        n_pad = shard_pad * self.n_dev
        ks_p = np.zeros((n_pad, self.d), dtype=np.float32)
        ks_p[: self.n_keys] = ks
        if self.n_dev > 1:
            self.keys_dev = jax.device_put(
                ks_p, NamedSharding(mesh, P(DATA_AXIS, None))
            )
        else:
            self.keys_dev = jnp.asarray(ks_p)

    def _rescore_rows(self, ks):
        """Host copy the int8 rescore pass reads (see `rescore` in
        __init__). bfloat16 halves the 5M x 768 host tax from 15.4 GB to
        7.7 GB; none drops it entirely."""
        if self.rescore == "none":
            return None
        if self.rescore == "bfloat16":
            import ml_dtypes

            return ks.astype(ml_dtypes.bfloat16)
        return ks


@functools.lru_cache(maxsize=64)
def _sharded_searcher(mesh, n_keys: int, shard_pad: int, k_eff: int,
                      key_chunk: int, use_pallas: bool, precision: str,
                      _interpret: bool):
    """Jitted shard_map searcher for the multi-device resident-keys path:
    per-device local top-k (Pallas kernel or XLA scan) + all-gathered exact
    global merge. Cached so repeated query chunks / sweep combinations reuse
    one compiled program per static config."""
    from jax import shard_map

    def local(qq, kk):
        dev = jax.lax.axis_index(DATA_AXIS)
        # per-shard validity: global indices [dev*shard_pad, ...)
        n_local_valid = jnp.clip(n_keys - dev * shard_pad, 0, shard_pad)
        if use_pallas:
            # the fused MXU kernel is the per-shard local search
            # (the 2.7x win applies on every device of the mesh)
            from bioscan_clip_tpu.ops.topk_pallas import pallas_topk

            vals, idxs = pallas_topk(
                qq, kk, n_local_valid, k=k_eff, tile=PALLAS_TILE,
                q_block=min(Q_BLOCK, qq.shape[0]),
                interpret=_interpret, precision=precision,
            )
        else:
            vals, idxs = _topk_scan(
                qq, kk, n_local_valid, k_eff, key_chunk,
                axis_name=DATA_AXIS, precision=precision,
            )
        idxs = idxs + dev * shard_pad
        vals_g = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        idxs_g = jax.lax.all_gather(idxs, DATA_AXIS, axis=1, tiled=True)
        best, sel = jax.lax.top_k(vals_g, k_eff)
        return best, jnp.take_along_axis(idxs_g, sel, axis=1)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, None)),
            out_specs=(P(), P()),
            # outputs are identical on all devices after the gathered
            # top-k merge, but that replication isn't statically provable
            check_vma=False,
        )
    )


def _sharded_searcher_i8(mesh, n_keys: int, shard_pad: int, k_eff: int,
                         _interpret: bool):
    """Jitted shard_map searcher for multi-device resident int8 keys:
    per-device local oversampled top-k through the int8 Pallas kernel +
    all-gathered exact global merge (the fp32 `_sharded_searcher` pattern;
    the caller's oversample/rescore pass stays unchanged on top)."""
    from jax import shard_map

    def local(q_i8, q_sc, kk, ksc):
        from bioscan_clip_tpu.ops.topk_pallas import pallas_topk_i8

        dev = jax.lax.axis_index(DATA_AXIS)
        n_local_valid = jnp.clip(n_keys - dev * shard_pad, 0, shard_pad)
        vals, idxs = pallas_topk_i8(
            q_i8, q_sc, kk, ksc, n_local_valid, k=k_eff, tile=PALLAS_TILE,
            q_block=min(Q_BLOCK, q_i8.shape[0]), interpret=_interpret,
        )
        idxs = idxs + dev * shard_pad
        vals_g = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        idxs_g = jax.lax.all_gather(idxs, DATA_AXIS, axis=1, tiled=True)
        best, sel = jax.lax.top_k(vals_g, k_eff)
        return best, jnp.take_along_axis(idxs_g, sel, axis=1)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS, None), P(None, DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


_sharded_searcher_i8 = functools.lru_cache(maxsize=64)(_sharded_searcher_i8)


def _search_prepared(q, pk: PreparedKeys, k_eff: int, query_chunk: int,
                     _interpret: bool):
    """Top-k of q against a device-resident PreparedKeys."""
    n_keys, n_dev, precision = pk.n_keys, pk.n_dev, pk.precision
    use_pallas, key_chunk = pk.use_pallas, pk.key_chunk

    if pk.int8:
        from bioscan_clip_tpu.ops.topk_pallas import (
            pallas_topk_i8,
            quantize_rows_i8,
        )

        # the int8 path is kernel-only: interpret it off-TPU (CPU tests /
        # CPU serving) like ops/attention does
        _interpret = _interpret or jax.default_backend() != "tpu"
        if n_dev > 1:
            search_i8 = _sharded_searcher_i8(
                pk.mesh, n_keys, pk.shard_pad, k_eff, _interpret
            )
        else:
            search_i8 = functools.partial(
                pallas_topk_i8, n_valid=n_keys, k=k_eff, tile=PALLAS_TILE,
                interpret=_interpret,
            )
        q_i8, q_sc = quantize_rows_i8(q)
        query_chunk = min(query_chunk, 1024)
        sims = np.empty((q.shape[0], k_eff), np.float32)
        idxs = np.empty((q.shape[0], k_eff), np.int64)
        for s in range(0, q.shape[0], query_chunk):
            qc, sc = q_i8[s : s + query_chunk], q_sc[s : s + query_chunk]
            nb = qc.shape[0]
            # int8 VMEM tiles are (32, 128): the query block must be a
            # 32-row multiple on real hardware
            qb = min(Q_BLOCK, _round_up(nb, 32))
            pad = (-nb) % qb
            if pad:
                qc = np.concatenate(
                    [qc, np.zeros((pad, pk.d), np.int8)], axis=0
                )
                sc = np.concatenate(
                    [sc, np.ones((pad, 1), np.float32)], axis=0
                )
            if n_dev > 1:
                v, i = search_i8(
                    jnp.asarray(qc), jnp.asarray(sc), pk.keys_dev,
                    pk.key_scales_dev,
                )
            else:
                v, i = search_i8(
                    jnp.asarray(qc), jnp.asarray(sc), pk.keys_dev,
                    pk.key_scales_dev, q_block=qb,
                )
            sims[s : s + nb] = np.asarray(v)[:nb]
            idxs[s : s + nb] = np.asarray(i, dtype=np.int64)[:nb]
        return sims, idxs

    if use_pallas and n_dev == 1:
        # direct kernel calls against the resident padded keys (no re-pad,
        # no re-upload — that is the whole point of PreparedKeys)
        from bioscan_clip_tpu.ops.topk_pallas import pallas_topk

        query_chunk = min(query_chunk, 1024)
        sims = np.empty((q.shape[0], k_eff), np.float32)
        idxs = np.empty((q.shape[0], k_eff), np.int64)
        for s in range(0, q.shape[0], query_chunk):
            qc = q[s : s + query_chunk]
            nb = qc.shape[0]
            qb = min(Q_BLOCK, nb)
            pad = (-nb) % qb
            if pad:
                qc = np.concatenate(
                    [qc, np.zeros((pad, pk.d), np.float32)], axis=0
                )
            v, i = pallas_topk(
                jnp.asarray(qc), pk.keys_dev, n_keys, k=k_eff,
                tile=PALLAS_TILE, q_block=qb, interpret=_interpret,
                precision=precision,
            )
            sims[s : s + nb] = np.asarray(v)[:nb]
            idxs[s : s + nb] = np.asarray(i, dtype=np.int64)[:nb]
        return sims, idxs

    shard_pad = pk.shard_pad
    if n_dev > 1:
        # built (and jitted) ONCE per static config via the lru_cache below —
        # a fresh jit(shard_map(...)) per query chunk would retrace and
        # recompile on every chunk of every sweep combination
        search = _sharded_searcher(
            pk.mesh, n_keys, shard_pad, k_eff, key_chunk, use_pallas,
            precision, _interpret,
        )
    else:

        def search(qd, kd):
            return _topk_scan(
                qd, kd, n_keys, k_eff, key_chunk, precision=precision
            )

    sims_out = np.empty((q.shape[0], k_eff), np.float32)
    idx_out = np.empty((q.shape[0], k_eff), np.int64)
    if use_pallas and n_dev > 1:
        # the kernel requires the query block count to divide evenly
        query_chunk = _round_up(min(query_chunk, 4096), Q_BLOCK)
    for s in range(0, q.shape[0], query_chunk):
        qs = q[s : s + query_chunk]
        n_q = qs.shape[0]
        if use_pallas and n_dev > 1 and n_q % min(Q_BLOCK, n_q) != 0:
            pad = _round_up(n_q, Q_BLOCK) - n_q
            qs = np.concatenate(
                [qs, np.zeros((pad, pk.d), np.float32)], axis=0
            )
        vals, idxs = search(jnp.asarray(qs), pk.keys_dev)
        sims_out[s : s + n_q] = np.asarray(vals)[:n_q]
        idx_out[s : s + n_q] = np.asarray(idxs, dtype=np.int64)[:n_q]
    return sims_out, idx_out


def _rescore_exact(q, host_keys, idxs, k: int):
    """fp32 rescore of oversampled int8 candidates: inner products against
    the host key rows (upcast from the configured storage dtype), stable
    re-sort, truncate to k."""
    cand = np.asarray(host_keys[idxs], dtype=np.float32)  # (B, ko, D)
    sims = np.einsum("bd,bkd->bk", q, cand)
    sel = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return (
        np.take_along_axis(sims, sel, axis=1),
        np.take_along_axis(idxs, sel, axis=1),
    )


def topk_search(
    query_feature,
    keys_feature,
    k: int,
    mesh=None,
    key_chunk: int = 65536,
    query_chunk: int = 8192,
    use_pallas: Optional[bool] = None,
    max_device_keys: Optional[int] = None,
    precision: str = "high",
    rescore: str = "float32",
    _interpret: bool = False,
):
    """Exact top-k inner-product search. Returns (similarities, indices) as
    numpy arrays, shapes (Bq, k) — the FAISS `index.search` contract.

    `keys_feature` may be a raw (N, D) array or a `PreparedKeys` (keys
    normalized/padded/uploaded once and reused across calls — the eval
    sweep in retrieval/report.py does this). NOTE: raw arrays are searched
    as-is (no normalization), matching the historical contract;
    PreparedKeys normalizes at construction unless `normalized=True`.

    If `mesh` is given and has >1 device on the data axis, keys are sharded
    across devices and per-device top-ks are merged exactly. On a single
    TPU device with a large key set the fused Pallas kernel
    (ops/topk_pallas.py, ~2.7x the XLA scan at 1M keys) is used; set
    `use_pallas=False` to force the XLA path.

    Key sets larger than device memory (SURVEY.md §2.9: up to ~5M x 768 on
    BIOSCAN-5M = 15.4 GB fp32 vs 16 GB HBM/chip) are HOST-STREAMED with
    DOUBLE BUFFERING: while the kernel searches slab i, slab i+1's
    `device_put` is already in flight, so total time ~= max(upload,
    compute) per slab instead of their sum. Per-slab top-ks merge exactly
    on host. `max_device_keys` overrides the per-device slab budget.

    `precision`: score-matmul precision on TPU. "high" (default, bf16x3)
    is fp32-faithful like the FAISS IndexFlatIP this engine replaces;
    "default" is single-pass bf16 (~2x faster scores, ~2e-3 score error —
    fine for throughput benchmarking, can flip near-ties); "int8" stores
    keys as per-row-quantized resident codes (4x capacity — 5M x 768 fits
    one 16 GB chip), ranks an oversampled pool with exact integer tile
    dots, and re-scores candidates in fp32, so RETURNED scores are exact
    inner products (single-device meshes)."""
    q = np.asarray(query_feature, dtype=np.float32)

    if isinstance(keys_feature, PreparedKeys):
        pk = keys_feature
    else:
        pk = PreparedKeys(
            np.asarray(keys_feature, dtype=np.float32), mesh=mesh,
            key_chunk=key_chunk, use_pallas=use_pallas,
            max_device_keys=max_device_keys, precision=precision,
            normalized=True,  # historical topk_search contract: as-is
            rescore=rescore,
        )
    k_eff = min(k, pk.n_keys)
    int8 = pk.precision == "int8"
    # int8: oversample the quantized ranking, then rescore against the host
    # rows (rescore="none" returns the quantized ranking/scores directly)
    do_rescore = int8 and pk.rescore != "none"
    k_search = (
        min(pk.n_keys, max(4 * k_eff, k_eff + 16)) if do_rescore else k_eff
    )

    if not pk.streaming:
        vals, idxs = _search_prepared(q, pk, k_search, query_chunk,
                                      _interpret)
        if do_rescore:
            vals, idxs = _rescore_exact(q, pk.host_keys, idxs, k_eff)
        return vals, idxs

    # host-streamed slabs with double buffering: prepare (pad + async
    # device_put) slab i+1 while slab i is being searched
    ks = pk.host_keys
    slab = pk.max_device_keys
    bounds = [
        (s, min(s + slab, pk.n_keys)) for s in range(0, pk.n_keys, slab)
    ]

    def _prep(b):
        return PreparedKeys(
            ks[b[0] : b[1]], mesh=pk.mesh, key_chunk=pk.key_chunk,
            use_pallas=pk.use_pallas, max_device_keys=slab,
            precision=pk.precision, normalized=True, rescore=pk.rescore,
        )

    best_v = best_i = None
    nxt = _prep(bounds[0])  # device_put dispatches asynchronously
    for j, (start, stop) in enumerate(bounds):
        cur = nxt
        if j + 1 < len(bounds):
            nxt = _prep(bounds[j + 1])  # upload overlaps the search below
        # int8 slabs: cur._search_prepared returns quantized-ranking
        # candidates; oversample per slab (k_search), rescore ONCE globally
        # after the merge
        v, i = _search_prepared(
            q, cur, min(k_search, stop - start), query_chunk, _interpret
        )
        del cur
        i = i.astype(np.int64) + start
        if best_v is None:
            best_v, best_i = v, i
        else:  # exact host merge of two sorted top-k lists
            cat_v = np.concatenate([best_v, v], axis=1)
            cat_i = np.concatenate([best_i, i], axis=1)
            sel = np.argsort(-cat_v, axis=1, kind="stable")[:, :k_search]
            best_v = np.take_along_axis(cat_v, sel, axis=1)
            best_i = np.take_along_axis(cat_i, sel, axis=1)
    if do_rescore:
        best_v, best_i = _rescore_exact(q, pk.host_keys, best_i, k_eff)
    return best_v, best_i


def find_k_closest_records(
    input_file_name_list, input_feature_np_array, keys_file_name_list,
    keys_feature_np_array, k: int = 5, mesh=None,
):
    """Retrieval-by-filename helper (util/util.py:159-169): for each input
    record, the file names of its k nearest keys by inner product."""
    _, indices = topk_search(
        np.asarray(input_feature_np_array, np.float32),
        np.asarray(keys_feature_np_array, np.float32),
        k, mesh=mesh,
    )
    return {
        input_file_name_list[i]: [keys_file_name_list[j] for j in row]
        for i, row in enumerate(indices)
    }


def make_prediction(
    query_feature,
    keys_feature,
    keys_label,
    with_similarity: bool = False,
    with_indices: bool = False,
    max_k: int = 5,
    mesh=None,
):
    """Reference-parity prediction (inference_and_eval.py:414-445): normalize
    query+keys, top-k search, expand neighbor indices into per-level label
    lists. `keys_feature` may be a PreparedKeys (already normalized +
    device-resident) to amortize the key upload across query types."""
    qn = l2norm_np(query_feature)
    if isinstance(keys_feature, PreparedKeys):
        kn = keys_feature
    else:
        kn = l2norm_np(keys_feature)
    similarities, indices = topk_search(qn, kn, max_k, mesh=mesh)

    pred_list = []
    for key_indices in indices:
        k_pred = {
            level: [keys_label[i][level] for i in key_indices]
            for level in LEVELS
        }
        pred_list.append(k_pred)

    out = [pred_list]
    if with_similarity:
        out.append(similarities)
    if with_indices:
        out.append(indices)
    return out[0] if len(out) == 1 else out
