"""Attention kernel microbenchmark at the production DiT shape.

Reproduces the round-1 layer decomposition claim (docs/COVERAGE.md: attention
is softmax/VPU-bound at ~345 ms/layer-call) and records the round-2 kernel
lineup.  Axon-relay methodology: block_until_ready can return without
waiting, so each measurement chains ``iters`` dependent calls inside ONE jit
program (call i+1 consumes call i's output as q, so nothing is dead-code
eliminated) and fetches a scalar reduction of the final output.  Accuracy is
asserted at a small shape (full-output fetches of the 755 MB production
output through the relay are prohibitively slow); tests/test_attention_tpu.py
carries the same check as an assertion.

Usage: python bench_attention.py            # production shape on the chip
       python bench_attention.py --small    # tiny shape (CPU-safe)
Prints one JSON line.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def time_chained(fn, q, k, v, iters=5):
    """Wall-clock one jit program of ``iters`` dependency-chained calls."""

    @jax.jit
    def chained(q, k, v):
        def body(_, qq):
            return fn(qq, k, v).astype(q.dtype)

        return jnp.float32(jax.lax.fori_loop(0, iters, body, q).sum())

    float(chained(q, k, v))  # warm compile
    t0 = time.time()
    float(chained(q, k, v))
    return (time.time() - t0) / iters


def make_qkv(b, h, s_real, d, block=1024, seed=0):
    rng = np.random.default_rng(seed)
    s = s_real + (-s_real) % block
    dt = jnp.bfloat16
    valid = jnp.asarray((np.arange(s) < s_real).astype(np.float32))
    vmask = valid[None, None, :, None].astype(dt)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), dt) * vmask
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), dt) * vmask
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), dt) * vmask
    return q, k, v, valid


def check_accuracy(scale):
    """Production dispatch path vs the XLA einsum at a small odd shape, so
    the padding/analytic-correction path engages."""
    from trajectorycrafter_tpu.ops.attention import _flash_exp2_t, _xla_attention

    q, k, v, _ = make_qkv(2, 4, 1800, 64, block=1, seed=1)
    want = np.asarray(_xla_attention(q, k, v, scale), np.float32)
    got = np.asarray(_flash_exp2_t(q, k, v, scale), np.float32)
    err = float(np.abs(got - want).max())
    print(f"# exp2_t dispatch vs xla (1800 tok, padded): max|err| {err:.4g}",
          file=sys.stderr)
    assert err < 5e-3, f"exp2 kernel accuracy blown: {err}"


def main():
    from trajectorycrafter_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    small = "--small" in sys.argv or jax.devices()[0].platform == "cpu"
    # production joint-attention shape: CFG pair x 48 heads x (226 text +
    # 13x36x64 video tokens = 30178, padded to 30720) x 64
    b, h, d = 2, 48, 64
    s_real = 226 + 13 * 36 * 64
    if small:
        b, h, s_real = 1, 4, 2000
    scale = d**-0.5

    check_accuracy(scale)
    q, k, v, valid = make_qkv(b, h, s_real, d)

    results = {}
    from trajectorycrafter_tpu.ops.pallas.flash_exp2 import flash_attention_exp2

    if not small:
        from trajectorycrafter_tpu.ops.attention import _flash_attention

        results["flash_stock"] = time_chained(
            lambda q, k, v: _flash_attention(q, k, v, scale), q, k, v)

        from trajectorycrafter_tpu.ops.pallas.flash_lse import (
            flash_attention_with_lse,
        )

        results["flash_lse"] = time_chained(
            lambda q, k, v: flash_attention_with_lse(q, k, v, sm_scale=scale)[0],
            q, k, v)
    else:
        from trajectorycrafter_tpu.ops.attention import _xla_attention

        results["xla"] = time_chained(
            lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v, iters=2)

    for bq, bk in ((512, 1024),):
        name = f"flash_exp2_{bq}x{bk}"
        try:
            results[name] = time_chained(
                lambda q, k, v: flash_attention_exp2(
                    q, k, v, kv_valid=valid, sm_scale=scale,
                    block_q=bq, block_k=bk,
                ), q, k, v)
        except Exception as e:
            print(f"# {name}: failed ({str(e)[:120]})", file=sys.stderr)
            continue
        print(f"# {name}: {results[name]*1e3:.1f} ms", file=sys.stderr)

    # the production kernel (transposed PV, VPU denominator, analytic pad
    # correction), timed through the real dispatch incl. output transpose
    from trajectorycrafter_tpu.ops.attention import _flash_exp2_t

    for bq, bk in ((1024, 1024), (2048, 1024)):
        name = f"flash_exp2_t_{bq}x{bk}"
        try:
            from trajectorycrafter_tpu.ops.pallas.flash_exp2 import (
                flash_attention_exp2_t,
            )

            results[name] = time_chained(
                lambda q, k, v: flash_attention_exp2_t(
                    q, k, v, sm_scale=scale, block_q=bq, block_k=bk,
                ).swapaxes(2, 3), q, k, v)
        except Exception as e:
            print(f"# {name}: failed ({str(e)[:120]})", file=sys.stderr)
            continue
        print(f"# {name}: {results[name]*1e3:.1f} ms", file=sys.stderr)
    results["dispatch_flash"] = time_chained(
        lambda q, k, v: _flash_exp2_t(q, k, v, scale), q, k, v)
    print(f"# dispatch_flash: {results['dispatch_flash']*1e3:.1f} ms",
          file=sys.stderr)

    # PV-int8 variant (round-3 review item: measure the bounded ~0.6 s/step
    # lever either way) -- probability tile quantized per query column, PV on
    # the int8 MXU, QK^T kept bf16
    if not small:
        from trajectorycrafter_tpu.ops.attention import _flash_exp2_t_pv8

        try:
            results["dispatch_flash_pv8"] = time_chained(
                lambda q, k, v: _flash_exp2_t_pv8(q, k, v, scale), q, k, v)
            print(f"# dispatch_flash_pv8: "
                  f"{results['dispatch_flash_pv8']*1e3:.1f} ms",
                  file=sys.stderr)
        except Exception as e:
            print(f"# dispatch_flash_pv8: failed ({str(e)[:120]})",
                  file=sys.stderr)

    # depth-UNet production shape (round-5 item: the SVD UNet has no QK-norm
    # so it cannot use the fixed-bias exp2 kernel; A/B the stock running-max
    # kernel against the two-pass TRUE-max exp2 kernel at the UNet's largest
    # spatial-attention call -- 49 frames x 5 heads x 9216 tokens (72x128
    # latent grid at 576x1024) x 64, which divides the 1024 block exactly)
    if not small:
        from trajectorycrafter_tpu.ops.attention import _flash_maxpass

        qd, kd, vd, _ = make_qkv(49, 5, 9216, 64, seed=2)
        for name, fn in (
            ("depth_flash_stock",
             lambda q, k, v: _flash_attention(q, k, v, scale)),
            ("depth_flash_max",
             lambda q, k, v: _flash_maxpass(q, k, v, scale)),
        ):
            try:
                results[name] = time_chained(fn, qd, kd, vd)
                print(f"# {name}: {results[name]*1e3:.1f} ms", file=sys.stderr)
            except Exception as e:
                print(f"# {name}: failed ({str(e)[:120]})", file=sys.stderr)
        del qd, kd, vd

    base = results.get("flash_stock", results.get("xla"))
    # headline value covers the DiT shape only; depth_* entries are a
    # different shape and are reported as their own fields
    best = min(t for n, t in results.items() if not n.startswith("depth_"))
    print(json.dumps({
        "metric": "attention_layer_call_ms",
        "value": round(best * 1e3, 1),
        "unit": f"ms/call ({b}x{h}x{q.shape[2]}x{d} bf16)",
        "vs_baseline": round(base / best, 3),
        **{f"{n}_ms": round(t * 1e3, 1) for n, t in results.items()},
    }))


if __name__ == "__main__":
    main()
