"""Probe: does the axon tunnel worker kill long-running dispatches?

Round-3 crash data (BENCH_TRAIN_sweep_r03.jsonl) shows the K-steps-per-
dispatch train step crashes the TPU worker whenever B*K exceeds ~16-20k
samples REGARDLESS of the stacked batch's bytes (3.7 GB crashed while
4.29 GB ran fine), which rules out the round-2 memory-ceiling explanation.
The remaining variable that scales with B*K is per-dispatch EXECUTION TIME
(~45 s fixed + ~0.21 s/step at B=128 -> the working K=128 dispatch executes
~72 s; every crashing config extrapolates to >75 s).

This probe runs a ~8 MB-footprint chained-matmul loop whose duration is
dialed by the iteration count — if a duration threshold (and not bytes)
crashes the worker, the watchdog theory is confirmed and through-tunnel
train throughput has a hard measurement ceiling.

Usage: python tools/probe_exec_watchdog.py --seconds 60
       python tools/probe_exec_watchdog.py --sweep 30,60,75,90,105
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

N = 2048


def make_run(iters: int, with_big: bool = False):
    if with_big:
        # variant: a multi-GB buffer lives in the program (read once) to
        # test whether the crash needs duration x footprint, not duration
        @jax.jit
        def run(c, big):
            c = c + big[0, :N].astype(jnp.bfloat16)[None, :] * 1e-6

            def body(_, c):
                c = jnp.dot(c, c, preferred_element_type=jnp.float32)
                return (c / jnp.max(jnp.abs(c))).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, iters, body, c)

        return run

    @jax.jit
    def run(c):
        def body(_, c):
            c = jnp.dot(c, c, preferred_element_type=jnp.float32)
            # renormalize so values stay finite for any iteration count
            return (c / jnp.max(jnp.abs(c))).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, iters, body, c)

    return run


_BIG = None


def timed(iters: int, big_gb: float = 0.0):
    global _BIG
    c0 = jnp.eye(N, dtype=jnp.bfloat16) + 0.01
    if big_gb > 0:
        if _BIG is None:
            rows = int(big_gb * 1e9 / (4 * 8192))
            _BIG = jnp.ones((rows, 8192), jnp.float32)
            _BIG.block_until_ready()
        run = make_run(iters, with_big=True)
        t0 = time.perf_counter()
        out = run(c0, _BIG)
        v = float(jnp.sum(out))
        return time.perf_counter() - t0, v
    run = make_run(iters)
    t0 = time.perf_counter()
    out = run(c0)
    v = float(jnp.sum(out))  # host fetch forces execution
    return time.perf_counter() - t0, v


def main():
    args = sys.argv[1:]
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    # calibrate (includes compile of the calibration program)
    t_cal, _ = timed(2000)
    t_cal2, _ = timed(2000)  # cached second call = pure execute
    per_iter = t_cal2 / 2000
    print(json.dumps({"calib_s": round(t_cal2, 2),
                      "us_per_iter": round(per_iter * 1e6, 2)}), flush=True)

    targets = [60.0]
    if "--seconds" in args:
        targets = [float(args[args.index("--seconds") + 1])]
    if "--sweep" in args:
        targets = [float(x) for x in args[args.index("--sweep") + 1].split(",")]
    iters_list = None
    if "--iters-sweep" in args:
        # direct iteration counts — the short-run calibration underestimates
        # per-iter time (fixed dispatch overhead), so big targets need this
        iters_list = [
            int(x) for x in args[args.index("--iters-sweep") + 1].split(",")
        ]

    big_gb = (
        float(args[args.index("--big-gb") + 1]) if "--big-gb" in args else 0.0
    )
    for j, tgt in enumerate(iters_list or targets):
        iters = tgt if iters_list else max(1, int(tgt / per_iter))
        try:
            dur, v = timed(iters, big_gb)  # includes compile for this iters
            dur2, v = timed(iters, big_gb)  # cached
            print(json.dumps({
                "target_s": tgt, "iters": iters, "big_gb": big_gb,
                "first_call_s": round(dur, 1), "exec_s": round(dur2, 1),
                "ok": True,
            }), flush=True)
        except Exception as e:  # worker crash surfaces as JaxRuntimeError
            print(json.dumps({
                "target_s": tgt, "iters": iters, "ok": False,
                "error": type(e).__name__, "msg": str(e)[:200],
            }), flush=True)
            return


if __name__ == "__main__":
    main()
