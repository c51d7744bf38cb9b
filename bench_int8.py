"""On-chip int8 GEMM bench: bf16 vs XLA-int8 vs Pallas-int8 vs fused FF chain.

Production FF shape: M = 2*(29952+226) CFG-pair tokens at 49f@576x1024
(padded to 512), 3072 -> 12288 -> 3072 (the reference FF,
crosstransformer3d.py:140 / diffusers FeedForward gelu-approximate).
Records the routing decision behind Int8Dense impl="auto"
(trajectorycrafter_tpu/ops/int8.py); see docs/COVERAGE.md round-3 notes.

Axon-relay methodology (same as bench_attention.py): block_until_ready can
return without waiting, so each measurement chains ``iters`` dependent calls
inside ONE jit program (call i+1 consumes call i's output, nothing is DCEd)
and fetches a scalar reduction of the final output.
"""
import json
import time
import functools
import sys

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.ops.int8 import int8_dense_forward
from trajectorycrafter_tpu.ops.pallas.int8_matmul import int8_ff_apply

small = "--small" in sys.argv
M, D, H = (2048, 256, 1024) if small else (60416, 3072, 12288)
key = jax.random.PRNGKey(0)
x = (jax.random.normal(key, (M, D), jnp.float32) * 0.5).astype(jnp.bfloat16)
w1 = (jax.random.normal(jax.random.PRNGKey(1), (D, H), jnp.float32) * 0.02).astype(jnp.bfloat16)
w2 = (jax.random.normal(jax.random.PRNGKey(2), (H, D), jnp.float32) * 0.02).astype(jnp.bfloat16)
b1 = jnp.zeros((H,), jnp.float32)
b2 = jnp.zeros((D,), jnp.float32)

w1q = jnp.clip(jnp.round(w1.astype(jnp.float32) / 2e-4), -127, 127).astype(jnp.int8)
w2q = jnp.clip(jnp.round(w2.astype(jnp.float32) / 2e-4), -127, 127).astype(jnp.int8)
s1 = jnp.full((H,), 2e-4, jnp.float32)
s2 = jnp.full((D,), 2e-4, jnp.float32)


def gelu(v):
    c = 0.7978845608028654
    vf = v.astype(jnp.float32)
    return (0.5 * vf * (1 + jnp.tanh(c * (vf + 0.044715 * vf**3)))).astype(v.dtype)


def ff_bf16(x):
    h = gelu(x @ w1 + b1.astype(jnp.bfloat16))
    return h @ w2 + b2.astype(jnp.bfloat16)


def ff_int8_xla(x):
    h = int8_dense_forward(x, w1q, s1, bias=b1, dtype=jnp.bfloat16)
    return int8_dense_forward(gelu(h), w2q, s2, bias=b2, dtype=jnp.bfloat16)


def ff_int8_pallas(x):
    h = int8_dense_forward(x, w1q, s1, bias=b1, dtype=jnp.bfloat16,
                           use_pallas=True)
    return int8_dense_forward(gelu(h), w2q, s2, bias=b2, dtype=jnp.bfloat16,
                              use_pallas=True)


def ff_fused(x):
    return int8_ff_apply(x, w1q, s1, b1, w2q, s2, b2, out_dtype=jnp.bfloat16)


def time_chained(name, fn, iters=8):
    """Wall-clock one jit program of ``iters`` dependency-chained FF calls;
    the chain output feeds back as x (D-in == D-out), scaled back to keep
    activations in quantization range."""

    @jax.jit
    def chained(x):
        def body(_, xx):
            y = fn(xx)
            return (y * (0.5 / jnp.maximum(
                jnp.max(jnp.abs(y.astype(jnp.float32))), 1e-6)).astype(
                    y.dtype)).astype(x.dtype)

        return jnp.float32(jax.lax.fori_loop(0, iters, body, x).sum())

    float(chained(x))  # warm compile
    t0 = time.time()
    float(chained(x))
    dt = (time.time() - t0) / iters * 1000
    print(f"# {name}: {dt:.2f} ms", file=sys.stderr, flush=True)
    return dt


t_bf16 = time_chained("bf16 chain       ", ff_bf16)
t_xla = time_chained("int8 XLA chain   ", ff_int8_xla)
if jax.default_backend() == "tpu":
    t_pal = time_chained("int8 Pallas chain", ff_int8_pallas)
    t_fus = time_chained("int8 fused FF    ", ff_fused)
else:  # Pallas needs the chip (CPU backend = interpret-only)
    t_pal = t_fus = float("inf")
flops = 2 * M * D * H * 2
print(json.dumps({
    "metric": "int8_ff_chain_ms",
    "unit": f"ms at M={M} {D}->{H}->{D}",
    "bf16_ms": round(t_bf16, 2), "xla_int8_ms": round(t_xla, 2),
    "pallas_int8_ms": round(t_pal, 2) if t_pal != float("inf") else None,
    "fused_int8_ms": round(t_fus, 2) if t_fus != float("inf") else None,
    "bf16_tfs": round(flops / t_bf16 / 1e9, 1),
    "xla_int8_tfs": round(flops / t_xla / 1e9, 1),
    "value": round(t_xla, 2),
    "speedup_xla": round(t_bf16 / t_xla, 3),
    "speedup_pallas": round(t_bf16 / t_pal, 3) if t_pal != float("inf") else None,
    "speedup_fused": round(t_bf16 / t_fus, 3) if t_fus != float("inf") else None,
}))
