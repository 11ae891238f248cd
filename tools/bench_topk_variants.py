"""Top-k kernel decomposition bench (VERDICT r4 #4: the retrieval kernel
ran ~10x off roofline and nobody wrote down the limiter).

Times, on the real chip, for the production grid/block layout:
  - matmul-only control kernels (same BlockSpecs/grid, dot + per-row max,
    NO top-k maintenance) -> the achievable floor incl. DMA + grid overhead
  - the production pallas_topk / pallas_topk_i8
  - sweep over tile in {512, 1024, 2048} and score precision
so the merge cost and the matmul efficiency separate cleanly.

Every row: one JSON line appended to --out (default BENCH_TOPK_r05.jsonl).

    python tools/bench_topk_variants.py [--keys 1048576] [--queries 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

try:
    from bioscan_clip_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_only_kernel(n_valid_ref, q_ref, k_ref, out_ref, *, tile, precision,
                    int8=False):
    """Control: the production kernel's dot + mask + per-row running max,
    with no top-k buffer maintenance. Output (Bq, 128) holds the running
    row max broadcast over lanes (forces the dot to be live)."""
    t = pl.program_id(1)

    q = q_ref[:]
    kt = k_ref[:]
    if int8:
        q = q.astype(jnp.bfloat16)
        kt = kt.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    base = t * tile
    col_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    sm = jnp.where(col_idx < n_valid_ref[0], s, float("-inf"))
    m = jnp.max(sm, axis=1, keepdims=True)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, float("-inf"))

    out_ref[:] = jnp.maximum(out_ref[:], m)


@functools.partial(
    jax.jit, static_argnames=("tile", "q_block", "precision", "int8")
)
def mm_only(queries, keys, n_valid, tile=512, q_block=256,
            precision="high", int8=False):
    Bq, D = queries.shape
    N = keys.shape[0]
    n_tiles = N // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bq // q_block, n_tiles),
        in_specs=[
            pl.BlockSpec((q_block, D), lambda qi, t, nv: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda qi, t, nv: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_block, 128), lambda qi, t, nv: (qi, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _mm_only_kernel, tile=tile, int8=int8,
        precision=(
            jax.lax.Precision.DEFAULT
            if precision == "default"
            else jax.lax.Precision.HIGHEST
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bq, 128), jnp.float32),
    )(jnp.asarray([n_valid], jnp.int32), queries, keys)


def _bench(fn, *args, iters=5):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=1_048_576)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--out", default="BENCH_TOPK_r05.jsonl")
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from bioscan_clip_tpu.ops.topk_pallas import (
        pallas_topk, pallas_topk_i8, quantize_rows_i8,
    )

    rng = np.random.default_rng(0)
    ks = rng.standard_normal((args.keys, args.dim)).astype(np.float32)
    ks /= np.linalg.norm(ks, axis=1, keepdims=True)
    q = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_j = jnp.asarray(q)
    ks_j = jnp.asarray(ks)
    q_i8, q_sc = quantize_rows_i8(q)
    k_i8, k_sc = quantize_rows_i8(ks)
    qi_j, qs_j = jnp.asarray(q_i8), jnp.asarray(q_sc)
    ki_j, ksc_j = jnp.asarray(k_i8), jnp.asarray(k_sc.reshape(1, -1))

    dev = jax.devices()[0]
    n_tiles_per_qb = None

    def emit(row):
        row["device"] = str(dev)
        row["keys"] = args.keys
        row["queries"] = args.queries
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    # analytic roofline per (256, tile) tile at D=768:
    #   HBM: tile*768*bytes / 819e9  (keys stream once per query block)
    #   MXU: 256*tile*768*2 / peak
    for tile in [int(x) for x in args.tiles.split(",")]:
        if args.keys % tile:
            continue
        n_tiles = (args.keys // tile) * (args.queries // 256)
        for prec in ("default", "high"):
            dt = _bench(
                functools.partial(mm_only, tile=tile, precision=prec),
                q_j, ks_j, args.keys, iters=args.iters,
            )
            emit({"variant": "mm_only_f32", "tile": tile,
                  "precision": prec, "s": round(dt, 4),
                  "us_per_tile": round(1e6 * dt / n_tiles, 2)})
            dt = _bench(
                functools.partial(
                    pallas_topk, k=args.k, tile=tile, precision=prec
                ),
                q_j, ks_j, args.keys, iters=args.iters,
            )
            emit({"variant": "topk_f32", "tile": tile,
                  "precision": prec, "k": args.k, "s": round(dt, 4),
                  "us_per_tile": round(1e6 * dt / n_tiles, 2)})
        dt = _bench(
            functools.partial(mm_only, tile=tile, precision="default",
                              int8=True),
            qi_j, ki_j, args.keys, iters=args.iters,
        )
        emit({"variant": "mm_only_i8", "tile": tile, "s": round(dt, 4),
              "us_per_tile": round(1e6 * dt / n_tiles, 2)})
        k_i8_eff = max(args.k, 21)  # the engine's oversampled candidate k
        dt = _bench(
            functools.partial(pallas_topk_i8, k=k_i8_eff, tile=tile),
            qi_j, qs_j, ki_j, ksc_j, args.keys, iters=args.iters,
        )
        emit({"variant": "topk_i8", "tile": tile, "k": k_i8_eff,
              "s": round(dt, 4),
              "us_per_tile": round(1e6 * dt / n_tiles, 2)})


if __name__ == "__main__":
    main()
