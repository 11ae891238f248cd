"""TPU smoke for the in-kernel attention dropout (tools/, run standalone).

Runs the fused MHA kernel WITH dropout on the real chip at BERT-small-ish
shapes and checks the output against the XLA forward with the explicitly
materialized dropout_keep_4d mask (same hash RNG). Small shapes — compiles
fast, disambiguates 'Mosaic kernel fault' from HBM ceilings.

ONE TPU process at a time: run only when nothing else holds the chip.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bioscan_clip_tpu.ops.attention import (
    _xla_probs,
    dropout_keep_4d,
    mha,
)

b, n, heads, hd = 8, 133, 12, 64
d = heads * hd
rng = np.random.default_rng(0)
q, k, v = (
    jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    for _ in range(3)
)
seed = jnp.uint32(4242)
rate = 0.1

out = mha(q, k, v, heads=heads, dropout_rate=rate, dropout_seed=seed,
          interpret=False)
keep = dropout_keep_4d(seed, b, heads, n, rate)
p = _xla_probs(q, k, None, heads, hd**-0.5) * keep
vh = v.reshape(b, n, heads, hd)
ref = jnp.einsum("bhnm,bmhd->bnhd", p.astype(v.dtype), vh).reshape(b, n, d)
err = float(jnp.max(jnp.abs(out - ref)))
print("fwd max err:", err)
# TPU fp32 matmuls run as bf16 passes by default; the kernel and the XLA
# reference take different accumulation paths -> ~6e-4 observed max err
assert err < 2e-3, err

# backward through the kernel
g = jax.grad(
    lambda q, k, v: jnp.sum(
        mha(q, k, v, heads=heads, dropout_rate=rate, dropout_seed=seed,
            interpret=False) ** 2
    ),
    argnums=(0, 1, 2),
)(q, k, v)
for x in g:
    assert bool(jnp.isfinite(x).all())
print("bwd finite: OK")
print("SMOKE DROPOUT TPU OK")
