"""Contract tests for the official Video-Depth-Anything checkpoint mapping
(utils/convert.convert_vda_official + expected_vda_official_keys).

The official .pth is unreachable offline (zero egress) and the reference
consumes it through a non-vendored checkout (main_alignment.py:108-112), so
the manifest is derived from the public Video-Depth-Anything code structure
(torchhub DINOv2 backbone, MiDaS-scratch DPT head, AnimateDiff motion
modules).  These tests close the loops that CAN be closed offline:
  * converter consumes exactly the manifest's keys (nothing silently missed);
  * the converted tree is structurally identical (same paths + shapes) to
    the flax model's init tree, so a checkpoint matching the manifest loads
    without surgery;
  * the spatial (non-temporal) official path agrees numerically with the
    HF-transformers path that IS parity-tested against torch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.models.vda import VDAConfig, VideoDepthAnything
from trajectorycrafter_tpu.utils.convert import (
    RecordingDict,
    convert_vda_official,
    expected_vda_official_keys,
    verify_state_dict,
)

HS, LAYERS, MLP = 32, 2, 4.0
FEATURES, OUT_CH, HEAD_HIDDEN = 16, (8, 8, 16, 16), 8
FACTORS = (4.0, 2.0, 1.0, 0.5)
GRID = 4  # pos_embed grid (image_size 56 / patch 14)


def _cfg(num_temporal_blocks=4):
    return VDAConfig(
        hidden_size=HS, num_hidden_layers=LAYERS, num_attention_heads=4,
        mlp_ratio=MLP, patch_size=14, image_size=56, out_indices=(1, 2, 2, 2),
        features=FEATURES, out_channels=OUT_CH, head_hidden_size=HEAD_HIDDEN,
        num_temporal_blocks=num_temporal_blocks, temporal_heads=8,
    )


def _synthetic_official_sd(rng, num_temporal_blocks=4):
    """Random state dict shaped exactly like the official .pth at tiny scale."""
    sd = {}

    def add(key, *shape):
        sd[key] = rng.standard_normal(shape).astype(np.float32)

    def wb(prefix, out_s, in_s):
        add(prefix + ".weight", *out_s) if isinstance(out_s, tuple) else None
        sd[prefix + ".weight"] = rng.standard_normal(out_s).astype(np.float32)
        sd[prefix + ".bias"] = rng.standard_normal(in_s).astype(np.float32)

    add("pretrained.cls_token", 1, 1, HS)
    add("pretrained.pos_embed", 1, GRID * GRID + 1, HS)
    add("pretrained.mask_token", 1, HS)
    wb("pretrained.patch_embed.proj", (HS, 3, 14, 14), (HS,))
    wb("pretrained.norm", (HS,), (HS,))
    for i in range(LAYERS):
        p = f"pretrained.blocks.{i}"
        wb(p + ".norm1", (HS,), (HS,))
        wb(p + ".norm2", (HS,), (HS,))
        wb(p + ".attn.qkv", (3 * HS, HS), (3 * HS,))
        wb(p + ".attn.proj", (HS, HS), (HS,))
        wb(p + ".mlp.fc1", (int(HS * MLP), HS), (int(HS * MLP),))
        wb(p + ".mlp.fc2", (HS, int(HS * MLP)), (HS,))
        add(p + ".ls1.gamma", HS)
        add(p + ".ls2.gamma", HS)

    for i, (ch, factor) in enumerate(zip(OUT_CH, FACTORS)):
        wb(f"head.projects.{i}", (ch, HS, 1, 1), (ch,))
        if factor > 1:
            k = int(factor)
            wb(f"head.resize_layers.{i}", (ch, ch, k, k), (ch,))  # ConvTranspose
        elif factor < 1:
            wb(f"head.resize_layers.{i}", (ch, ch, 3, 3), (ch,))
        sd[f"head.scratch.layer{i + 1}_rn.weight"] = rng.standard_normal(
            (FEATURES, ch, 3, 3)).astype(np.float32)
    for n in range(1, 5):
        p = f"head.scratch.refinenet{n}"
        wb(p + ".out_conv", (FEATURES, FEATURES, 1, 1), (FEATURES,))
        for r in ("resConfUnit1", "resConfUnit2"):
            wb(f"{p}.{r}.conv1", (FEATURES, FEATURES, 3, 3), (FEATURES,))
            wb(f"{p}.{r}.conv2", (FEATURES, FEATURES, 3, 3), (FEATURES,))
    wb("head.scratch.output_conv1", (FEATURES // 2, FEATURES, 3, 3), (FEATURES // 2,))
    wb("head.scratch.output_conv2.0", (HEAD_HIDDEN, FEATURES // 2, 3, 3),
       (HEAD_HIDDEN,))
    wb("head.scratch.output_conv2.2", (1, HEAD_HIDDEN, 1, 1), (1,))

    temporal_channels = [OUT_CH[2], OUT_CH[3], FEATURES, FEATURES]
    for i in range(num_temporal_blocks):
        c = temporal_channels[i]
        tt = f"head.motion_modules.{i}.temporal_transformer"
        wb(tt + ".norm", (c,), (c,))
        wb(tt + ".proj_in", (c, c), (c,))
        wb(tt + ".proj_out", (c, c), (c,))
        blk = f"{tt}.transformer_blocks.0"
        for k in range(2):
            a = f"{blk}.attention_blocks.{k}"
            add(a + ".to_q.weight", c, c)
            add(a + ".to_k.weight", c, c)
            add(a + ".to_v.weight", c, c)
            wb(a + ".to_out.0", (c, c), (c,))
            add(a + ".pos_encoder.pe", 1, 32, c)
            wb(f"{blk}.norms.{k}", (c,), (c,))
        wb(blk + ".ff.net.0.proj", (8 * c, c), (8 * c,))
        wb(blk + ".ff.net.2", (c, 4 * c), (c,))
        wb(blk + ".ff_norm", (c,), (c,))
    return sd


def test_manifest_matches_synthetic_checkpoint(rng):
    sd = _synthetic_official_sd(rng)
    verify_state_dict(sd, expected_vda_official_keys(LAYERS), "vda_official")


def test_converter_consumes_every_manifest_key(rng):
    sd = RecordingDict(_synthetic_official_sd(rng))
    convert_vda_official(sd, num_layers=LAYERS)
    assert sd.consumed == set(sd.keys()), (
        f"unconsumed: {sorted(set(sd.keys()) - sd.consumed)[:8]}")


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): np.shape(l) for p, l in flat}


@pytest.mark.parametrize("n_temporal", [4, 0])
def test_converted_tree_matches_model_init(rng, n_temporal):
    """Same param paths and shapes as the flax model -> strict load works."""
    sd = _synthetic_official_sd(rng, num_temporal_blocks=n_temporal)
    params = convert_vda_official(sd, num_layers=LAYERS,
                                  num_temporal_blocks=n_temporal)
    model = VideoDepthAnything(_cfg(n_temporal))
    frames = jnp.zeros((1, 2, 28, 28, 3))
    want = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), frames))["params"]
    assert _tree_shapes(params) == _tree_shapes(want)


@pytest.mark.slow
def test_official_forward_runs_and_respects_zero_init(rng):
    """Converted params drive a forward; zeroing proj_out reproduces the
    temporal-free (spatial) model output exactly."""
    sd = _synthetic_official_sd(rng)
    # scale down for a numerically tame forward
    sd = {k: (v * 0.05).astype(np.float32) for k, v in sd.items()}
    params = convert_vda_official(sd, num_layers=LAYERS)
    model = VideoDepthAnything(_cfg(4))
    frames = jnp.asarray(rng.standard_normal((1, 2, 28, 28, 3)), jnp.float32)
    out = model.apply({"params": params}, frames)
    assert out.shape == (1, 2, 28, 28)
    assert np.isfinite(np.asarray(out)).all()

    for i in range(4):
        # official zero_module zeroes the whole proj_out (kernel AND bias)
        po = params["head"][f"temporal_{i}"]["proj_out"]
        po["kernel"], po["bias"] = po["kernel"] * 0.0, po["bias"] * 0.0
    zeroed = model.apply({"params": params}, frames)

    spatial_params = {
        "backbone": params["backbone"],
        "head": {k: v for k, v in params["head"].items()
                 if not k.startswith("temporal_")},
    }
    spatial = VideoDepthAnything(_cfg(0)).apply(
        {"params": spatial_params}, frames)
    np.testing.assert_allclose(np.asarray(zeroed), np.asarray(spatial),
                               atol=1e-5)
