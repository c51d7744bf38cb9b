"""Video-Depth-Anything model tests.

The spatial path (DINOv2 backbone + DPT neck/head with 0 temporal blocks) is
exactly single-image Depth Anything; it is parity-tested against transformers'
torch ``DepthAnythingForDepthEstimation`` on a tiny random config, which also
validates the ``convert_vda`` key mapping end-to-end (reference consumes this
model family through the non-vendored Video-Depth-Anything checkout,
notebooks/12_11_25_consistent_depth/.../main_alignment.py:108-112).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from trajectorycrafter_tpu.models.vda import (
    VDAConfig,
    VideoDepthAnything,
    normalize_imagenet,
    denormalize_imagenet,
    vda_vitl_config,
    vda_vits_config,
)
from trajectorycrafter_tpu.utils.convert import (
    convert_vda,
    expected_vda_keys,
    verify_state_dict,
)


def _tiny_hf_model():
    from transformers import DepthAnythingConfig, Dinov2Config
    from transformers.models.depth_anything.modeling_depth_anything import (
        DepthAnythingForDepthEstimation,
    )

    backbone = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        patch_size=14,
        image_size=56,
        out_indices=[1, 2, 3, 4],
        apply_layernorm=True,
        reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=backbone,
        reassemble_hidden_size=32,
        fusion_hidden_size=16,
        neck_hidden_sizes=[8, 16, 24, 32],
        reassemble_factors=[4, 2, 1, 0.5],
        head_hidden_size=8,
        head_in_index=-1,
        patch_size=14,
    )
    torch.manual_seed(0)
    return DepthAnythingForDepthEstimation(cfg).eval()


def _tiny_cfg(num_temporal_blocks=0):
    return VDAConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        mlp_ratio=4.0,
        patch_size=14,
        image_size=56,
        out_indices=(1, 2, 3, 4),
        features=16,
        out_channels=(8, 16, 24, 32),
        head_hidden_size=8,
        num_temporal_blocks=num_temporal_blocks,
        temporal_heads=4,
    )


@pytest.mark.slow
def test_vda_spatial_parity_vs_transformers(rng):
    hf = _tiny_hf_model()
    px = rng.standard_normal((2, 3, 56, 70), dtype=np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(px)).predicted_depth.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    verify_state_dict(sd, expected_vda_keys(4), "vda")
    params = convert_vda(sd, num_layers=4)
    model = VideoDepthAnything(_tiny_cfg(0))
    frames = jnp.asarray(px.transpose(0, 2, 3, 1))[:, None]  # (B, T=1, H, W, 3)
    got = np.asarray(model.apply({"params": params}, frames))[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_vda_spatial_parity_nondefault_grid(rng):
    """Non-square input away from image_size exercises the bicubic position
    embedding interpolation (torch interpolate_pos_encoding)."""
    hf = _tiny_hf_model()
    px = rng.standard_normal((1, 3, 84, 42), dtype=np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(px)).predicted_depth.numpy()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_vda(sd, num_layers=4)
    model = VideoDepthAnything(_tiny_cfg(0))
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(px.transpose(0, 2, 3, 1))[:, None])
    )[:, 0]
    # bicubic interpolation differs slightly between torch and jax.image;
    # the tiny-config output is dominated by it, so allow a loose tolerance
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


@pytest.mark.slow
def test_vda_temporal_blocks_shapes(rng):
    """Temporal modules keep shapes; at init they are exact identities
    (official zero_initialize=True -> zero proj_out); once proj_out is
    non-zero the output depends on other frames (the point of the
    spatio-temporal head)."""
    cfg = _tiny_cfg(num_temporal_blocks=2)
    model = VideoDepthAnything(cfg)
    frames = jnp.asarray(rng.standard_normal((1, 3, 28, 42, 3), dtype=np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames)["params"]
    out = model.apply({"params": params}, frames)
    assert out.shape == (1, 3, 28, 42)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()  # relative head ends in relu

    # zero-initialised motion modules: temporally perturbing frame 2 must
    # NOT leak into frame 0 at init
    frames2 = frames.at[:, 2].add(1.0)
    out2 = model.apply({"params": params}, frames2)
    np.testing.assert_allclose(np.asarray(out2[:, 0]), np.asarray(out[:, 0]),
                               atol=1e-6)

    # un-zero proj_out -> frame 0's depth must now depend on frame 2
    import flax

    params = flax.core.unfreeze(params)
    for i in range(2):
        tm = params["head"][f"temporal_{i}"]["proj_out"]
        tm["kernel"] = jnp.ones_like(tm["kernel"]) * 0.05
    out3 = model.apply({"params": params}, frames)
    out4 = model.apply({"params": params}, frames2)
    assert np.abs(np.asarray(out4[:, 0]) - np.asarray(out3[:, 0])).max() > 1e-6


def test_vda_preset_configs():
    l, s = vda_vitl_config(), vda_vits_config()
    assert l.hidden_size == 1024 and l.out_channels == (256, 512, 1024, 1024)
    assert l.out_indices == (5, 12, 18, 24)
    assert s.hidden_size == 384 and s.features == 64


def test_imagenet_normalise_roundtrip(rng):
    x = rng.random((2, 4, 4, 3), dtype=np.float32)
    back = denormalize_imagenet(normalize_imagenet(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


@pytest.mark.slow
def test_infer_video_depth_windowed(rng):
    """Windowed chaining: scale/shift-aligned overlap, ramp blend, full
    coverage of an arbitrary-length clip (INFER_LEN/OVERLAP scheme)."""
    import jax
    from trajectorycrafter_tpu.models.vda import infer_video_depth

    cfg = _tiny_cfg(0)
    model = VideoDepthAnything(cfg)
    frames = jnp.asarray(rng.standard_normal((11, 28, 28, 3), dtype=np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames[None, :1])["params"]
    # bias the head so depth is non-zero (alive relu) and alignment is
    # well-posed
    params["head"]["head_conv3"]["bias"] = jnp.full_like(
        params["head"]["head_conv3"]["bias"], 0.5)
    out = infer_video_depth(model, params, frames, window=6, overlap=2)
    assert out.shape == (11, 28, 28)
    assert np.isfinite(np.asarray(out)).all()
    # single-window path
    out1 = infer_video_depth(model, params, frames[:4], window=6, overlap=2)
    assert out1.shape == (4, 28, 28)
