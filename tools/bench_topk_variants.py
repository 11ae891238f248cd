"""Top-k kernel decomposition bench (VERDICT r4 #4: the retrieval kernel
ran ~10x off roofline and nobody wrote down the limiter).

Timing methodology (hard-won, round 5): the axon runtime result-caches
executions with identical (program, args) and its block_until_ready can
acknowledge before execution completes when calls are pipelined. Honest
numbers require BOTH (a) distinct inputs per call and (b) a device->host
fetch of the last output to force completion. Every row here does both;
`dispatch_floor` measures the pure per-call dispatch+sync cost with a
trivial kernel so device time can be separated from tunnel overhead.

Rows (one JSON line each, appended to --out):
  dispatch_floor   tiny kernel: per-call host dispatch + sync overhead
  mm_only_*        production BlockSpecs/grid, dot + row max, NO top-k
                   maintenance -> achievable floor incl. DMA + grid cost
  topk_f32/topk_i8 the production kernels
over tile in {512,1024,2048} x precision, qb 256/512.

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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(jnp.asarray([n_valid], jnp.int32), queries, keys)


def _tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


@jax.jit
def tiny(x):
    return pl.pallas_call(
        _tiny_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x)


def bench_pipelined(make_call, variants, iters=8):
    """Mean per-call seconds: ONE DISTINCT input per timed call (the
    runtime replays identical (program, args) executions from cache —
    PERF_NOTES trap #1 — so variants[0] is burned on the warmup and each
    timed call consumes its own fresh input), pipelined dispatch,
    completion forced by fetching the last output's corner."""
    n = min(iters, len(variants) - 1)
    assert n >= 1, "need iters+1 distinct inputs (one is the warmup)"
    r = make_call(variants[0])
    np.asarray(jax.tree.leaves(r)[0])[:1]  # compile + hard sync
    t0 = time.perf_counter()
    outs = [make_call(variants[1 + j]) for j in range(n)]
    np.asarray(jax.tree.leaves(outs[-1])[0][:1])  # forces all (in-order)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=1_048_576)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--out", default="BENCH_TOPK_r05.jsonl")
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from bioscan_clip_tpu.ops.topk_pallas import (
        pallas_topk, pallas_topk_i8, quantize_rows_i8,
    )

    rng = np.random.default_rng(0)
    ks = rng.standard_normal((args.keys, args.dim)).astype(np.float32)
    ks /= np.linalg.norm(ks, axis=1, keepdims=True)
    ks_j = jnp.asarray(ks)
    k_i8, k_sc = quantize_rows_i8(ks)
    ki_j, ksc_j = jnp.asarray(k_i8), jnp.asarray(k_sc.reshape(1, -1))
    del ks, k_i8

    QV = []  # iters+1 distinct query sets so the runtime can't replay
    for s in range(args.iters + 1):
        q = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q_i8, q_sc = quantize_rows_i8(q)
        QV.append((jnp.asarray(q), jnp.asarray(q_i8), jnp.asarray(q_sc)))

    dev = jax.devices()[0]

    def emit(row):
        row["device"] = str(dev)
        row["keys"] = args.keys
        row["queries"] = args.queries
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    # pure dispatch+sync floor (distinct tiny inputs)
    tin = [jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
           for _ in range(args.iters + 1)]
    dt = bench_pipelined(lambda v: tiny(v), tin, iters=args.iters)
    emit({"variant": "dispatch_floor", "s": round(dt, 5)})

    def row(variant, dt, tile, n_tiles, extra=None):
        r = {"variant": variant, "tile": tile, "s": round(dt, 4),
             "us_per_tile": round(1e6 * dt / n_tiles, 2)}
        if extra:
            r.update(extra)
        emit(r)

    for tile in [int(x) for x in args.tiles.split(",")]:
        if args.keys % tile:
            continue
        for qb in (256, 512):
            n_tiles = (args.keys // tile) * (args.queries // qb) \
                * (qb // 256)  # normalize: per-(256 x tile) unit
            for prec in ("default", "high"):
                try:
                    dt = bench_pipelined(
                        lambda v: mm_only(v[0], ks_j, args.keys, tile=tile,
                                          q_block=qb, precision=prec),
                        QV, iters=args.iters)
                    row("mm_only_f32", dt, tile, n_tiles,
                        {"precision": prec, "q_block": qb})
                except Exception as e:
                    emit({"variant": "mm_only_f32", "tile": tile,
                          "q_block": qb, "precision": prec,
                          "error": str(e)[:160]})
                try:
                    dt = bench_pipelined(
                        lambda v: pallas_topk(v[0], ks_j, args.keys,
                                              k=args.k, tile=tile,
                                              q_block=qb, precision=prec),
                        QV, iters=args.iters)
                    row("topk_f32", dt, tile, n_tiles,
                        {"precision": prec, "q_block": qb, "k": args.k})
                except Exception as e:
                    emit({"variant": "topk_f32", "tile": tile,
                          "q_block": qb, "precision": prec,
                          "error": str(e)[:160]})
            try:
                dt = bench_pipelined(
                    lambda v: mm_only(v[1], ki_j, args.keys, tile=tile,
                                      q_block=qb, precision="default",
                                      int8=True),
                    QV, iters=args.iters)
                row("mm_only_i8", dt, tile, n_tiles, {"q_block": qb})
            except Exception as e:
                emit({"variant": "mm_only_i8", "tile": tile, "q_block": qb,
                      "error": str(e)[:160]})
            k_i8_eff = max(args.k, 21)  # the engine's oversampled k
            try:
                dt = bench_pipelined(
                    lambda v: pallas_topk_i8(v[1], v[2], ki_j, ksc_j,
                                             args.keys, k=k_i8_eff,
                                             tile=tile, q_block=qb),
                    QV, iters=args.iters)
                row("topk_i8", dt, tile, n_tiles,
                    {"q_block": qb, "k": k_i8_eff})
            except Exception as e:
                emit({"variant": "topk_i8", "tile": tile, "q_block": qb,
                      "error": str(e)[:160]})


if __name__ == "__main__":
    main()
