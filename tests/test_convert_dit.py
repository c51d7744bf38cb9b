"""DiT checkpoint-converter round-trip test.

T5/CLIP converters are parity-tested against transformers; the DiT has no
loadable torch twin here, so this validates the other half of the contract:
a torch-layout state dict synthesized from a flax param tree by the INVERSE
transforms must convert back to exactly that tree (names, shapes, values).
Catches any drift between models/dit.py naming and utils/convert.convert_dit.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
from trajectorycrafter_tpu.utils.convert import convert_dit


def _lin_inv(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _ln_inv(sd, prefix, p):
    if "scale" in p:
        sd[prefix + ".weight"] = np.asarray(p["scale"])
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _conv2d_inv(sd, prefix, p):
    sd[prefix + ".weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def synth_torch_sd(params, num_layers, cross_interval):
    """flax param tree -> reference-named torch state dict (inverse maps)."""
    sd = {}
    _conv2d_inv(sd, "patch_embed.proj", params["patch_embed_proj"])
    _lin_inv(sd, "patch_embed.text_proj", params["patch_embed_text_proj"])
    _conv2d_inv(sd, "ref_patch_embed.proj", params["ref_patch_embed_proj"])
    _lin_inv(sd, "time_embedding.linear_1", params["time_embedding_linear_1"])
    _lin_inv(sd, "time_embedding.linear_2", params["time_embedding_linear_2"])
    _ln_inv(sd, "norm_final", params["norm_final"])
    _lin_inv(sd, "norm_out.linear", params["norm_out_linear"])
    _ln_inv(sd, "norm_out.norm", params["norm_out_norm"])
    _lin_inv(sd, "proj_out", params["proj_out"])
    for i in range(num_layers):
        b = params[f"blocks_{i}"]
        p = f"transformer_blocks.{i}"
        _lin_inv(sd, f"{p}.norm1.linear", b["norm1"]["linear"])
        _ln_inv(sd, f"{p}.norm1.norm", b["norm1"]["norm"])
        _lin_inv(sd, f"{p}.norm2.linear", b["norm2"]["linear"])
        _ln_inv(sd, f"{p}.norm2.norm", b["norm2"]["norm"])
        for name in ("to_q", "to_k", "to_v"):
            _lin_inv(sd, f"{p}.attn1.{name}", b["attn1"][name])
        _lin_inv(sd, f"{p}.attn1.to_out.0", b["attn1"]["to_out"])
        _ln_inv(sd, f"{p}.attn1.norm_q", b["attn1"]["norm_q"])
        _ln_inv(sd, f"{p}.attn1.norm_k", b["attn1"]["norm_k"])
        _lin_inv(sd, f"{p}.ff.net.0.proj", b["ff"]["proj_in"])
        _lin_inv(sd, f"{p}.ff.net.2", b["ff"]["proj_out"])
    n_cross = num_layers // cross_interval
    for i in range(n_cross):
        c = params[f"perceiver_cross_attention_{i}"]
        p = f"perceiver_cross_attention.{i}"
        _ln_inv(sd, f"{p}.norm1", c["norm1"])
        _ln_inv(sd, f"{p}.norm2", c["norm2"])
        for name in ("to_q", "to_kv", "to_out"):
            _lin_inv(sd, f"{p}.{name}", c[name])
    return sd


@pytest.mark.slow
def test_convert_dit_roundtrip():
    model = CrossTransformer3DModel(
        num_attention_heads=2, attention_head_dim=16, in_channels=9,
        out_channels=4, time_embed_dim=16, text_embed_dim=32, num_layers=4,
        max_text_seq_length=7, cross_attn_dim_head=8, cross_attn_num_heads=4,
        cross_attn_interval=2, use_rotary_positional_embeddings=True,
        sample_width=12, sample_height=8, sample_frames=9,
    )
    b, f, h, w = 1, 3, 8, 12
    params = model.init(
        jax.random.PRNGKey(7),
        jnp.zeros((b, f, h, w, 4)), jnp.zeros((b, 7, 32)), jnp.zeros((b,)),
        jnp.zeros((b, f, h, w, 5)), jnp.zeros((b, 1, h, w, 4)),
    )["params"]

    sd = synth_torch_sd(params, num_layers=4, cross_interval=2)
    back = convert_dit(sd, num_layers=4, cross_attn_interval=2)

    flat_orig = {"/".join(str(k.key) for k in path): np.asarray(leaf)
                 for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_back = {"/".join(str(k.key) for k in path): np.asarray(leaf)
                 for path, leaf in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(flat_orig) == set(flat_back), (
        set(flat_orig) ^ set(flat_back))
    for k in flat_orig:
        np.testing.assert_array_equal(flat_orig[k], flat_back[k], err_msg=k)
