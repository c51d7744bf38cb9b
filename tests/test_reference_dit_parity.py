"""Numerical parity of models/dit.py + utils/convert.convert_dit against the
reference's own CrossTransformer3DModel (crosstransformer3d.py:711 forward).

The reference module is executed for real with tests/diffusers_shim.py
standing in for the handful of diffusers building blocks it imports (the shim
replicates both their state-dict naming and their math).  Both models are
instantiated at tiny scale, the torch state dict flows through our converter,
and forward outputs must agree.  This also pins ``expected_dit_keys`` to the
*instantiated* reference ``state_dict().keys()`` instead of a hand manifest
(round-2 verdict item #1).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=7,  # 4 noise + 3 inpaint
    out_channels=4,
    time_embed_dim=16,
    text_embed_dim=12,
    num_layers=4,
    sample_width=8,
    sample_height=8,
    sample_frames=9,
    patch_size=2,
    temporal_compression_ratio=4,
    max_text_seq_length=5,
    is_train_cross=True,
    cross_attn_in_channels=4,
    cross_attn_interval=2,
    cross_attn_dim_head=8,
    cross_attn_num_heads=2,
)


@pytest.fixture(scope="module")
def ref_mod():
    from diffusers_shim import install  # tests/ dir is on sys.path under pytest

    install()
    spec = importlib.util.spec_from_file_location(
        "ref_crosstransformer3d", os.path.join(REF, "models/crosstransformer3d.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_model(ref_mod, use_rope: bool):
    import torch

    torch.manual_seed(0)
    model = ref_mod.CrossTransformer3DModel(
        use_rotary_positional_embeddings=use_rope, **TINY
    )
    model.eval()
    return model


def _inputs(rng, use_rope: bool):
    b, f, h, w = 2, 3, 8, 8
    hidden = rng.standard_normal((b, f, 4, h, w)).astype(np.float32)
    inpaint = rng.standard_normal((b, f, 3, h, w)).astype(np.float32)
    cross = rng.standard_normal((b, 1, 4, h, w)).astype(np.float32)
    text = rng.standard_normal((b, 5, 12)).astype(np.float32)
    timestep = np.array([400, 10], np.int32)
    rope = None
    if use_rope:
        from trajectorycrafter_tpu.ops.rope import get_3d_rotary_pos_embed

        grid = (h // 2, w // 2)
        rope = get_3d_rotary_pos_embed(
            TINY["attention_head_dim"], ((0, 0), grid), grid, f
        )
    return hidden, inpaint, cross, text, timestep, rope


def test_expected_dit_keys_match_instantiated_reference(ref_mod):
    """The checkpoint-key contract equals the reference's real module tree."""
    from trajectorycrafter_tpu.utils.convert import expected_dit_keys

    model = _ref_model(ref_mod, use_rope=True)
    assert set(model.state_dict().keys()) == expected_dit_keys(
        num_layers=TINY["num_layers"],
        cross_attn_interval=TINY["cross_attn_interval"],
        has_ref_branch=True,
        attention_bias=True,
    )


@pytest.mark.parametrize("use_rope", [True, False])
@pytest.mark.slow
def test_dit_forward_matches_reference(ref_mod, rng, use_rope):
    import torch

    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.utils.convert import convert_dit

    ref = _ref_model(ref_mod, use_rope)
    hidden, inpaint, cross, text, timestep, rope = _inputs(rng, use_rope)

    with torch.no_grad():
        ref_out = ref(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(text),
            timestep=torch.from_numpy(timestep.astype(np.int64)),
            inpaint_latents=torch.from_numpy(inpaint),
            cross_latents=torch.from_numpy(cross),
            image_rotary_emb=(
                None
                if rope is None
                else tuple(torch.from_numpy(np.asarray(t)) for t in rope)
            ),
        ).sample.numpy()

    params = convert_dit(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        num_layers=TINY["num_layers"],
        cross_attn_interval=TINY["cross_attn_interval"],
    )
    model = CrossTransformer3DModel(
        num_attention_heads=TINY["num_attention_heads"],
        attention_head_dim=TINY["attention_head_dim"],
        in_channels=TINY["in_channels"],
        out_channels=TINY["out_channels"],
        time_embed_dim=TINY["time_embed_dim"],
        text_embed_dim=TINY["text_embed_dim"],
        num_layers=TINY["num_layers"],
        sample_width=TINY["sample_width"],
        sample_height=TINY["sample_height"],
        sample_frames=TINY["sample_frames"],
        max_text_seq_length=TINY["max_text_seq_length"],
        use_rotary_positional_embeddings=use_rope,
        cross_attn_dim_head=TINY["cross_attn_dim_head"],
        cross_attn_num_heads=TINY["cross_attn_num_heads"],
        attention_impl="xla",
    )
    out = model.apply(
        {"params": params},
        jnp.asarray(np.moveaxis(hidden, 2, -1)),
        jnp.asarray(text),
        jnp.asarray(timestep),
        inpaint_latents=jnp.asarray(np.moveaxis(inpaint, 2, -1)),
        cross_latents=jnp.asarray(np.moveaxis(cross, 2, -1)),
        image_rotary_emb=None if rope is None else tuple(jnp.asarray(t) for t in rope),
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 2), ref_out, atol=5e-4, rtol=1e-4
    )
