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
        init_vals = jax.lax.pvary(init_vals, (axis_name,))
        init_idx = jax.lax.pvary(init_idx, (axis_name,))

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
    _interpret: bool = False,
):
    """Exact top-k inner-product search. Returns (similarities, indices) as
    numpy arrays, shapes (Bq, k) — the FAISS `index.search` contract.

    If `mesh` is given and has >1 device on the data axis, keys are sharded
    across devices and per-device top-ks are merged exactly. On a single
    TPU device with a large key set the fused Pallas kernel
    (ops/topk_pallas.py, ~2.7x the XLA scan at 1M keys) is used; set
    `use_pallas=False` to force the XLA path.

    Key sets larger than device memory (SURVEY.md §2.9: up to ~5M x 768 on
    BIOSCAN-5M = 15.4 GB fp32 vs 16 GB HBM/chip) are HOST-STREAMED: keys
    stay in host RAM, device-sized slabs are searched one at a time, and
    the per-slab top-ks are merged exactly on host. `max_device_keys`
    overrides the per-device slab budget (default sized so keys + padding
    + workspace fit one chip).

    `precision`: score-matmul precision on TPU. "high" (default, bf16x3)
    is fp32-faithful like the FAISS IndexFlatIP this engine replaces;
    "default" is single-pass bf16 (~2x faster scores, ~2e-3 score error —
    fine for throughput benchmarking, can flip near-ties)."""
    q = np.asarray(query_feature, dtype=np.float32)
    ks = np.asarray(keys_feature, dtype=np.float32)
    n_keys, d = ks.shape
    k_eff = min(k, n_keys)

    if max_device_keys is None:
        # ~6 GB of fp32 keys per device (v5e: 16 GB HBM minus queries,
        # scores, and kernel workspace)
        n_dev_budget = 1
        if mesh is not None:
            n_dev_budget = int(
                np.prod([mesh.shape[a] for a in mesh.axis_names])
            )
        max_device_keys = int(6e9 / (4 * d)) * n_dev_budget
    if n_keys > max_device_keys:
        best_v = best_i = None
        for start in range(0, n_keys, max_device_keys):
            stop = min(start + max_device_keys, n_keys)
            v, i = topk_search(
                q, ks[start:stop], k_eff, mesh=mesh, key_chunk=key_chunk,
                query_chunk=query_chunk, use_pallas=use_pallas,
                max_device_keys=max_device_keys, precision=precision,
                _interpret=_interpret,
            )
            i = i.astype(np.int64) + start
            if best_v is None:
                best_v, best_i = v, i
            else:  # exact host merge of two sorted top-k lists
                cat_v = np.concatenate([best_v, v], axis=1)
                cat_i = np.concatenate([best_i, i], axis=1)
                sel = np.argsort(-cat_v, axis=1, kind="stable")[:, :k_eff]
                best_v = np.take_along_axis(cat_v, sel, axis=1)
                best_i = np.take_along_axis(cat_i, sel, axis=1)
        return best_v, best_i

    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and n_keys >= 100_000 * n_dev
        )
    if use_pallas and n_dev == 1:
        from bioscan_clip_tpu.ops.topk_pallas import topk_search_pallas

        return topk_search_pallas(
            q, ks, k_eff, query_chunk=min(query_chunk, 1024),
            interpret=_interpret, precision=precision,
        )

    PALLAS_TILE = 512
    Q_BLOCK = 256
    # pad keys so each device shard divides into whole chunks / kernel tiles
    shard = -(-n_keys // n_dev)
    if use_pallas:
        shard_pad = _round_up(shard, PALLAS_TILE)
    else:
        key_chunk = min(key_chunk, _round_up(shard, 8))
        shard_pad = _round_up(shard, key_chunk)
    n_pad = shard_pad * n_dev
    ks_p = np.zeros((n_pad, d), dtype=np.float32)
    ks_p[:n_keys] = ks

    if n_dev > 1:
        from jax import shard_map

        keys_sharded = jax.device_put(
            ks_p, NamedSharding(mesh, P(DATA_AXIS, None))
        )

        def search(qd, kd):
            def local(qq, kk):
                dev = jax.lax.axis_index(DATA_AXIS)
                # per-shard validity: global indices [dev*shard_pad, ...)
                n_local_valid = jnp.clip(
                    n_keys - dev * shard_pad, 0, shard_pad
                )
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
                    # top-k merge, but that replication isn't statically
                    # provable
                    check_vma=False,
                )
            )(qd, kd)
    else:
        keys_sharded = jnp.asarray(ks_p)

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
            qs = np.concatenate([qs, np.zeros((pad, d), np.float32)], axis=0)
        vals, idxs = search(jnp.asarray(qs), keys_sharded)
        sims_out[s : s + n_q] = np.asarray(vals)[:n_q]
        idx_out[s : s + n_q] = np.asarray(idxs, dtype=np.int64)[:n_q]
    return sims_out, idx_out


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
    lists."""
    qn = l2norm_np(query_feature)
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
