"""Attribute on-chip train-step time per op category from a profiler trace.

The chained-carry wall numbers (bench.py --train) bundle the tunnel's fixed
per-dispatch overhead with real device time; this tool captures a
`jax.profiler` trace of ONE small K-step dispatch and aggregates the device
plane's event durations by op category (matmul/conv vs elementwise vs
reduce vs copy), so we can see where the ~365 ms/step actually goes.

    python tools/trace_train_step.py [--batch 128] [--scan 8] \
        [--remat-policy dots] [--host-crop]

Prints one JSON line: total device time per category + top-20 ops.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def run_dispatch(batch, scan, remat_policy, host_crop, trace_dir,
                 rbg=False):
    from bench import _init_flagship
    from bioscan_clip_tpu.parallel.mesh import (
        create_mesh,
        shard_stacked_batches,
    )
    from bioscan_clip_tpu.train.loop import device_batch, make_scan_train_step
    from bioscan_clip_tpu.train.state import create_train_state

    model, params = _init_flagship(remat=True, remat_policy=remat_policy)
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    img_hw = (224, 224) if host_crop else (256, 384)
    b = {
        "image_u8": jnp.asarray(
            rng.integers(0, 256, size=(batch,) + img_hw + (3,)), jnp.uint8
        ),
        "dna": jnp.asarray(rng.integers(0, 1027, size=(batch, 133)), jnp.int32),
        "language": {
            "input_ids": jnp.asarray(
                rng.integers(0, 30522, size=(batch, 20)), jnp.int32
            ),
            "token_type_ids": jnp.zeros((batch, 20), jnp.int32),
            "attention_mask": jnp.ones((batch, 20), jnp.int32),
        },
        "labels": jnp.arange(batch, dtype=jnp.int32),
    }
    state = create_train_state(model, params, lambda s: 1e-3)
    kstep = make_scan_train_step(model, mesh, steps_per_call=scan)
    stacked = shard_stacked_batches(
        jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (scan,) + x.shape),
            device_batch(b),
        ),
        mesh,
    )
    key = (jax.random.key(7, impl="rbg") if rbg
           else jax.random.PRNGKey(7))
    state, losses = kstep(state, stacked, key)
    float(losses[-1])  # compile + warm outside the trace

    jax.profiler.start_trace(trace_dir)
    state, losses = kstep(state, stacked, key)
    float(losses[-1])
    jax.profiler.stop_trace()


CATEGORIES = (
    ("matmul", ("dot", "conv", "fusion.*dot")),
    ("copy", ("copy", "transpose", "reshape", "bitcast")),
    ("rng", ("rng", "threefry", "philox", "iota_rbg")),
    ("reduce", ("reduce", "sort", "top-k", "topk")),
)


def categorize(name):
    low = name.lower()
    for cat, keys in CATEGORIES:
        for k in keys:
            if k.split(".*")[0] in low:
                return cat
    return "other"


def _self_times(events):
    """events: [(name, start_ns, dur_ns)]. Events on one xplane line NEST
    by time interval (a while/fusion parent span contains its children);
    summing raw durations double-counts every level (the round-3 B=64
    trace summed to ~3x the true device time). Attribute each event its
    SELF time: duration minus the time covered by its direct children,
    via a sweep over the interval containment stack."""
    evs = sorted(events, key=lambda e: (e[1], -e[2]))
    stack = []  # (name, start, end, child_cover)
    out = []

    def pop_to(t):
        while stack and stack[-1][2] <= t:
            name, s, e, cover = stack.pop()
            out.append((name, (e - s) - cover))
            if stack:
                stack[-1][3] += e - s  # this whole span is the parent's child time

    for name, s, d in evs:
        e = s + d
        pop_to(s)
        # close any stack frames this event does not nest into
        while stack and stack[-1][2] < e:
            n2, s2, e2, cover = stack.pop()
            out.append((n2, (e2 - s2) - cover))
            if stack:
                stack[-1][3] += e2 - s2
        stack.append([name, s, e, 0])
    pop_to(float("inf"))
    return [(n, max(0.0, t) / 1e6) for n, t in out]  # ms


def aggregate(trace_dir):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        return None
    data = jax.profiler.ProfileData.from_file(paths[0])
    # Aggregate op categories ONLY from the flat leaf line ("XLA Ops" on
    # TPU, the PjRt client line on CPU), with per-event SELF time so
    # nested while/fusion parents don't double-count their children.
    planes = list(data.planes)
    dev_planes = [p for p in planes
                  if "TPU" in p.name or "/device:" in p.name]
    line_totals = {}
    best = None  # (score, events) for the leaf-op line
    for plane in dev_planes or planes:
        for line in plane.lines:
            lname = line.name or ""
            # python-callstack / framework lines are host-side spans, not
            # XLA ops — never candidates for the leaf-op line
            if lname.lower().startswith(("python", "framework")):
                continue
            evs = [(ev.name, ev.start_ns, ev.duration_ns)
                   for ev in line.events
                   if not ev.name.startswith(("$", "end:", "PjitFunction",
                                              "Thread", "Python"))]
            if not evs:
                continue
            total = sum(d for _, _, d in evs) / 1e6
            line_totals[f"{plane.name} :: {lname}"] = round(total, 2)
            is_leaf = ("ops" in lname.lower()
                       or "client" in lname.lower())
            score = (1 if is_leaf else 0, len(evs))
            if best is None or score > best[0]:
                best = (score, evs)
    per_op = collections.Counter()
    per_cat = collections.Counter()
    leaf_total = 0.0
    for name, dur_ms in _self_times(best[1]) if best else []:
        per_op[name] += dur_ms
        per_cat[categorize(name)] += dur_ms
        leaf_total += dur_ms
    return {
        "leaf_total_ms": round(leaf_total, 2),
        "line_totals_ms": line_totals,
        "per_category_ms": {
            k: round(v, 2) for k, v in per_cat.most_common()
        },
        "top_ops_ms": {
            k[:100]: round(v, 2) for k, v in per_op.most_common(25)
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--remat-policy", default="dots")
    ap.add_argument("--host-crop", action="store_true")
    ap.add_argument("--rbg", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir for Perfetto inspection")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (safe while a TPU client is live; the "
                    "ambient sitecustomize ignores JAX_PLATFORMS env)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    trace_dir = tempfile.mkdtemp(prefix="bscan_trace_")
    run_dispatch(args.batch, args.scan, args.remat_policy, args.host_crop,
                 trace_dir, rbg=args.rbg)
    agg = aggregate(trace_dir)
    out = {
        "batch": args.batch,
        "scan": args.scan,
        "remat_policy": args.remat_policy,
        "host_crop": args.host_crop,
        "trace_dir": trace_dir if args.keep else None,
        "agg": agg,
    }
    if agg:
        out["per_step_leaf_ms"] = round(
            agg["leaf_total_ms"] / args.scan, 2
        )
    print(json.dumps(out))
    if not args.keep:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
