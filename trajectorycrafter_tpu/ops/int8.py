"""int8 MXU GEMMs for the DiT's projection/FF layers (opt-in).

v5e's MXU runs int8 x int8 -> int32 at up to 2x the bf16 rate.  Measured on
this chip at the production FF shape (M=60416 CFG-pair tokens,
3072->12288->3072 chain, bench_int8.py chained timing, docs/COVERAGE.md
round-3 notes): 1.507x end-to-end with dynamic per-token activation
quantization (260 TF/s vs 172 bf16) -- XLA does not reach the nominal 2x.
Quality: per-GEMM mean relative error ~4% (cosine 0.9999) vs bf16.

Scheme: weights per-output-channel symmetric int8 (quantized once, host
side); activations per-token symmetric int8 computed dynamically in the
kernel's prologue; fp32 rescale + bias.  This replaces the reference's
precision strategy (straight bf16 autocast, SURVEY.md section 1) only where
the MXU is the bottleneck and only behind ``quant="int8"``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def pallas_int8_ok(in_features: int, out_features: int) -> bool:
    """True when auto-routing should use the blocked Pallas int8 kernels.

    Measured on-chip at the production FF shape (M=60416 CFG-pair tokens,
    3072->12288->3072, bench_int8.py chained timing, 2026-08-18): XLA int8
    35.1 ms (1.507x bf16) vs fused Pallas FF chain 35.4 ms vs unfused
    Pallas GEMMs 40.8 ms -- XLA's int8 lowering ties-or-beats Mosaic, so
    "auto" stays on XLA and the Pallas kernels are opt-in via
    ``TRAJCRAFTER_INT8_IMPL=pallas`` (unmeshed TPU + 256-aligned dims only;
    the mesh path keeps XLA so pjit can partition the GEMM).  The env var
    is read at trace time -- clear jit caches before flipping it."""
    import os

    if os.environ.get("TRAJCRAFTER_INT8_IMPL") != "pallas":
        return False
    return (jax.default_backend() == "tpu"
            and jax.sharding.get_abstract_mesh().empty
            and in_features % 256 == 0 and out_features % 256 == 0)


def int8_dense_forward(x, kernel_q, scale, bias=None, dtype=jnp.float32,
                       use_pallas: bool = False):
    """Functional Int8Dense forward (dynamic per-token activation quant +
    int8 GEMM + fp32 rescale); shared by :class:`Int8Dense` and the fused
    FF fallback path."""
    if use_pallas:
        from trajectorycrafter_tpu.ops.pallas.int8_matmul import (
            int8_dense_apply)
        return int8_dense_apply(x, kernel_q, scale, bias=bias, out_dtype=dtype)
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class Int8DenseParams(nn.Module):
    """Declares an Int8Dense-compatible param leaf set (kernel_q/scale/bias)
    without running a forward -- lets a parent module (the fused FF) own the
    apply while keeping the exact Int8Dense param tree and converter/
    checkpoint contracts."""

    features: int
    in_features: int
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (self.in_features, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype) if self.use_bias \
            else None
        return kernel_q, scale, bias


class Int8Dense(nn.Module):
    """Dense with int8 weights + dynamic per-token int8 activations.

    Params: ``kernel_q`` (in, out) int8, ``scale`` (out,) float32 such that
    ``kernel ~= kernel_q * scale``, optional ``bias``.  Produced from a
    regular Dense's params by :func:`quantize_dense_params`.

    ``impl``: "xla" = lax.dot_general int8 path; "pallas" = the blocked
    Pallas GEMM (ops/pallas/int8_matmul.py) with the dequant epilogue fused
    in-kernel; "auto" = xla (measured faster on-chip, see pallas_int8_ok)
    unless ``TRAJCRAFTER_INT8_IMPL=pallas`` opts the unmeshed-TPU path into
    the Pallas kernels.
    """

    features: int
    use_bias: bool = True
    impl: str = "auto"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _use_pallas(self, x, in_features: int) -> bool:
        if self.impl in ("xla", "pallas"):
            return self.impl == "pallas"
        return pallas_int8_ok(in_features, self.features)

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (in_features, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype) if self.use_bias \
            else None
        return int8_dense_forward(
            x, kernel_q, scale, bias=bias, dtype=self.dtype,
            use_pallas=self._use_pallas(x, in_features))


def quantize_dense_params(p: dict) -> dict:
    """{"kernel", ["bias"]} -> {"kernel_q", "scale", ["bias"]} (per-output-
    channel symmetric).  Host-side numpy: quantizing the 6.1B-param DiT on
    device would need the bf16 and int8 trees resident together (>HBM)."""
    import numpy as np

    w = np.asarray(p["kernel"], np.float32)
    scale = (np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0).astype(np.float32)
    kernel_q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    out = {"kernel_q": kernel_q, "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


# the DiT modules whose GEMMs are MXU-bound: block attention projections +
# FF, plus the Perceiver cross-attention projections (to_q/to_out run over
# the full ~30k video-token stream); patch/time layers are a negligible
# share of step FLOPs and stay bf16
DIT_INT8_TARGETS = ("to_q", "to_k", "to_kv", "to_v", "to_out",
                    "proj_in", "proj_out")
_INT8_MODULE_PREFIXES = ("blocks_", "perceiver_cross_attention_")


def quantize_dit_params(params: Any, targets=DIT_INT8_TARGETS) -> Any:
    """Quantize a CrossTransformer3D param tree for ``quant="int8"``.

    Only Dense kernels named in ``targets`` inside ``blocks_*`` /
    ``perceiver_cross_attention_*`` modules are converted (matches the
    model's module swap); everything else passes through unchanged.
    """

    def walk(tree, path):
        if isinstance(tree, dict):
            if ("kernel" in tree and len(path) >= 2 and path[-1] in targets
                    and path[0].startswith(_INT8_MODULE_PREFIXES)
                    # the model-level proj_out stays bf16 (tiny)
                    and len(jnp.shape(tree["kernel"])) == 2):
                return quantize_dense_params(tree)
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return tree

    return walk(params, ())


# Depth-UNet (SVD spatio-temporal) int8 surface: the transformer GEMMs.
# Mirrors models/depthcrafter.py's module swap EXACTLY -- self-attention
# q/k/v/out, cross-attention q/out (k/v read the 1-token CLIP context:
# nothing to win, conditioning-accuracy risk), GEGLU FF proj_in/out, and
# the TransformerSpatioTemporal-level proj_in/out.  Resnet convs, the
# time/frame embeds (time_pos_embed_linear_*), and AlphaBlender stay bf16.
import re as _re

_DEPTH_ATTN_MODULE = _re.compile(r"^(down|up)_\d+_attn_\d+$|^mid_attn$")


def quantize_depth_unet_params(params: Any) -> Any:
    """Quantize a UNetSpatioTemporalConditionModel param tree for
    ``quant="int8"`` (models/depthcrafter.py)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            if ("kernel" in tree and len(path) >= 2
                    and _DEPTH_ATTN_MODULE.match(path[0])
                    and len(jnp.shape(tree["kernel"])) == 2):
                leaf = path[-1]
                if leaf in ("to_q", "to_out", "proj_in", "proj_out") or (
                        leaf in ("to_k", "to_v") and path[-2] == "attn1"):
                    return quantize_dense_params(tree)
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return tree

    return walk(params, ())
