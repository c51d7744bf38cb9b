"""Checkpoint key-set contract tests.

The expected key manifests (utils/convert.expected_dit_keys /
expected_vae_keys) are derived by reading the REFERENCE module trees
(crosstransformer3d.py, autoencoder_magvit.py) -- they are the ground truth
for what the published checkpoints contain.  These tests close the loop in
both directions:

  manifest == keys the converter consumes   (a typo'd key in convert_* fails)
  converted tree == the Flax model's init tree (structure + shapes)

so a checkpoint that passes verify_state_dict is guaranteed to flow through
convert_* into a tree model.apply accepts, with no silently dropped weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
from trajectorycrafter_tpu.models.vae import AutoencoderKLCogVideoX
from trajectorycrafter_tpu.utils.convert import (
    RecordingDict,
    convert_dit,
    convert_vae,
    expected_dit_keys,
    expected_vae_keys,
    verify_state_dict,
)


def _tree_paths(tree):
    return {
        "/".join(str(k.key) for k in path): np.shape(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _synth_sd(expected, dim_of):
    """Build a dummy torch state dict with rank-correct arrays for each key.

    Ranks follow the reference module kinds: CausalConv3d wraps a Conv3d at
    ".conv" (autoencoder_magvit.py:126) and conv_shortcut is a plain Conv3d
    (:312); down/upsamplers hold a Conv2d at ".conv"; patch-embed projections
    are Conv2d; everything else is Linear weight (2-D) or norm/bias (1-D).
    """
    sd = {}
    for k in expected:
        sd[k] = np.zeros(dim_of(k), np.float32)
    return sd


# ----------------------------------------------------------------------------
# DiT
# ----------------------------------------------------------------------------

DIT_TINY = dict(
    num_attention_heads=2, attention_head_dim=16, in_channels=9,
    out_channels=4, time_embed_dim=16, text_embed_dim=32, num_layers=4,
    max_text_seq_length=7, cross_attn_dim_head=8, cross_attn_num_heads=4,
    cross_attn_interval=2, use_rotary_positional_embeddings=True,
    sample_width=12, sample_height=8, sample_frames=9,
)


def _dit_params():
    model = CrossTransformer3DModel(**DIT_TINY)
    b, f, h, w = 1, 3, 8, 12
    return model.init(
        jax.random.PRNGKey(7),
        jnp.zeros((b, f, h, w, 4)), jnp.zeros((b, 7, 32)), jnp.zeros((b,)),
        jnp.zeros((b, f, h, w, 5)), jnp.zeros((b, 1, h, w, 4)),
    )["params"]


def test_dit_converter_consumes_exactly_the_reference_keys():
    """convert_dit must read every reference checkpoint key, and only those."""
    from tests.test_convert_dit import synth_torch_sd

    expected = expected_dit_keys(num_layers=4, cross_attn_interval=2)
    sd = synth_torch_sd(_dit_params(), num_layers=4, cross_interval=2)
    # the inverse-synthesized torch sd has exactly the reference key set
    assert set(sd) == expected, sorted(set(sd) ^ expected)

    rec = RecordingDict(sd)
    params = convert_dit(rec, num_layers=4, cross_attn_interval=2)
    assert rec.consumed == expected, sorted(rec.consumed ^ expected)
    # and the converted tree is exactly the Flax model's init tree
    assert _tree_paths(params) == _tree_paths(_dit_params())


def test_dit_manifest_full_scale_counts():
    """Deployed checkpoint scale: 42 blocks, interval 2 -> 21 perceivers
    (crosstransformer3d.py:537-595, slurm_mlp_probing.sh reads block 40)."""
    keys = expected_dit_keys(42, 2)
    # top: patch_embed(4) + ref(2) + time(4) + norm_final(2) + norm_out(4)
    #      + proj_out(2) = 18
    # per block: norm1(4) + norm2(4) + qkv(6) + to_out(2) + qk norms(4)
    #            + ff(4) = 24
    # per perceiver: norms(4) + to_q/to_kv/to_out(3) = 7
    assert len(keys) == 18 + 42 * 24 + 21 * 7
    assert "transformer_blocks.41.attn1.to_out.0.weight" in keys
    assert "transformer_blocks.41.attn1.to_out.weight" not in keys
    assert "perceiver_cross_attention.20.to_kv.weight" in keys
    assert "perceiver_cross_attention.20.to_q.bias" not in keys  # bias=False
    assert "pos_embedding" not in keys  # non-persistent buffer


def test_dit_verify_state_dict_catches_drift():
    expected = expected_dit_keys(4, 2)
    sd = {k: np.zeros(1, np.float32) for k in expected}
    verify_state_dict(sd, expected, "dit")  # exact match passes
    bad = dict(sd)
    bad["transformer_blocks.0.attn1.to_out.weight"] = bad.pop(
        "transformer_blocks.0.attn1.to_out.0.weight")
    with pytest.raises(ValueError, match="Missing.*Unexpected"):
        verify_state_dict(bad, expected, "dit")
    # position_ids-style buffers are tolerated
    sd2 = dict(sd)
    sd2["text_model.position_ids"] = np.zeros(1, np.float32)
    verify_state_dict(sd2, expected, "dit")


# ----------------------------------------------------------------------------
# VAE
# ----------------------------------------------------------------------------

VAE_TINY = dict(
    latent_channels=4,
    block_out_channels=(8, 16, 16, 32),
    layers_per_block=1,
    norm_num_groups=4,
)


def _vae_rank(key):
    if key.endswith(".bias"):
        return None  # 1-D
    if "samplers.0.conv.weight" in key:
        return 4
    if key.endswith(".conv.weight") or key.endswith("conv_shortcut.weight"):
        return 5
    return None  # norm weights: 1-D


def test_vae_converter_consumes_exactly_the_reference_keys():
    expected = expected_vae_keys(VAE_TINY["block_out_channels"],
                                 VAE_TINY["layers_per_block"])

    def dim_of(k):
        r = _vae_rank(k)
        if r == 4:
            return (2, 2, 3, 3)
        if r == 5:
            return (2, 2, 1, 1, 1) if "shortcut" in k else (2, 2, 3, 3, 3)
        return (2,)

    rec = RecordingDict(_synth_sd(expected, dim_of))
    convert_vae(rec, VAE_TINY["layers_per_block"])
    assert rec.consumed == expected, sorted(rec.consumed ^ expected)


@pytest.mark.slow
def test_vae_converted_tree_matches_flax_init_tree():
    """Structure check: a manifest-complete checkpoint converts into exactly
    the param tree AutoencoderKLCogVideoX.init produces (paths AND shapes)."""
    model = AutoencoderKLCogVideoX(**VAE_TINY)
    x = jnp.zeros((1, 5, 32, 48, 3), jnp.float32)
    ref = _tree_paths(model.init(jax.random.PRNGKey(0), x)["params"])

    expected = expected_vae_keys(VAE_TINY["block_out_channels"],
                                 VAE_TINY["layers_per_block"])
    # invert the flax tree into reference torch shapes so the converted
    # shapes can be compared exactly
    inv = {}
    for path, shape in ref.items():
        parts = path.replace("resnets_", "resnets.").replace(
            "down_blocks_", "down_blocks.").replace(
            "up_blocks_", "up_blocks.").replace(
            "downsamplers_0", "downsamplers.0").replace(
            "upsamplers_0", "upsamplers.0").replace(
            "mid_block/resnets.", "mid_block.resnets.").split("/")
        leaf = parts[-1]
        prefix = ".".join(parts[:-1]).replace("/", ".")
        if leaf == "kernel":
            if len(shape) == 5:
                inv[prefix + ".weight"] = tuple(
                    shape[i] for i in (4, 3, 0, 1, 2))
            else:
                inv[prefix + ".weight"] = tuple(
                    shape[i] for i in (3, 2, 0, 1))
        elif leaf == "scale":
            inv[prefix + ".weight"] = shape
        else:
            inv[prefix + ".bias"] = shape
    assert set(inv) == expected, sorted(set(inv) ^ expected)

    sd = {k: np.zeros(s, np.float32) for k, s in inv.items()}
    verify_state_dict(sd, expected, "vae")
    params = convert_vae(sd, VAE_TINY["layers_per_block"])
    assert _tree_paths(params) == ref


def test_vae_manifest_full_scale_spots():
    keys = expected_vae_keys()
    assert "encoder.down_blocks.1.resnets.0.conv_shortcut.weight" in keys
    assert "encoder.down_blocks.0.resnets.0.conv_shortcut.weight" not in keys
    assert "decoder.up_blocks.1.resnets.0.conv_shortcut.weight" in keys
    assert "decoder.norm_out.conv_y.conv.weight" in keys
    assert "encoder.down_blocks.3.downsamplers.0.conv.weight" not in keys
    assert "decoder.up_blocks.2.upsamplers.0.conv.weight" in keys
    assert "quant_conv.weight" not in keys  # use_quant_conv=False (:1022)


# ----------------------------------------------------------------------------
# CLI
# ----------------------------------------------------------------------------


def test_convert_cli_roundtrip(tmp_path):
    """python -m trajectorycrafter_tpu.utils.convert on a synthetic tiny VAE
    checkpoint dir -> orbax dir restorable by checkpoints.restore_params."""
    import json

    from safetensors.numpy import save_file

    from trajectorycrafter_tpu.utils.checkpoints import restore_params
    from trajectorycrafter_tpu.utils.convert import main

    model = AutoencoderKLCogVideoX(**VAE_TINY)
    x = jnp.zeros((1, 5, 32, 48, 3), jnp.float32)
    ref = _tree_paths(model.init(jax.random.PRNGKey(0), x)["params"])

    # reuse the inverse from the structure test via expected manifest shapes
    expected = expected_vae_keys(VAE_TINY["block_out_channels"],
                                 VAE_TINY["layers_per_block"])

    def dim_of(k):
        r = _vae_rank(k)
        if r == 4:
            return (2, 2, 3, 3)
        if r == 5:
            return (2, 2, 1, 1, 1) if "shortcut" in k else (2, 2, 3, 3, 3)
        return (2,)

    src = tmp_path / "vae"
    src.mkdir()
    save_file(_synth_sd(expected, dim_of),
              str(src / "diffusion_pytorch_model.safetensors"))
    (src / "config.json").write_text(json.dumps({
        "block_out_channels": list(VAE_TINY["block_out_channels"]),
        "layers_per_block": VAE_TINY["layers_per_block"],
    }))
    out = tmp_path / "orbax_vae"
    assert main([str(src), str(out), "--component", "vae"]) == 0
    restored = restore_params(str(out))
    assert set(_tree_paths(restored)) == set(ref)
