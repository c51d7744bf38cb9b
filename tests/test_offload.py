"""Stage-wise host offload (utils/offload.py).

The reference keeps every model resident on a large A100 and falls back to
accelerate CPU-offload hooks (models/infer.py:34-43); here a real-weight
bundle (~35 GB bf16) exceeds one v5e chip's 16 GB HBM, so StageParams keeps
weights host-resident and device-places them per pipeline stage.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectorycrafter_tpu.utils import offload as off


def _tree(rng):
    return {
        "dense": {"kernel": rng.standard_normal((4, 3)).astype(np.float32),
                  "bias": np.zeros((3,), np.float32)},
    }


def test_stageparams_host_cache_and_release(rng):
    host = _tree(rng)
    sp = off.StageParams(host, offload=True, name="m")
    d1 = sp.device()
    assert isinstance(d1["dense"]["kernel"], jax.Array)
    assert sp.device() is d1  # cached until release
    sp.release()
    # release DELETES the device buffers synchronously (refcount-GC deletes
    # can lag the next stage's allocations through a remote-backend relay);
    # stale references to the released tree are invalid by contract
    assert d1["dense"]["kernel"].is_deleted()
    d2 = sp.device()
    assert d2 is not d1  # re-placed after release
    np.testing.assert_array_equal(np.asarray(host["dense"]["kernel"]),
                                  np.asarray(d2["dense"]["kernel"]))


def test_stageparams_no_offload_keeps_device(rng):
    sp = off.StageParams(_tree(rng), offload=False)
    d1 = sp.device()
    sp.release()  # no-op
    assert sp.device() is d1


def test_stageparams_materialize_and_ctx():
    calls = []

    def make():
        calls.append(1)
        return {"w": jnp.ones((2, 2))}

    sp = off.StageParams(materialize=make, offload=True)
    with sp as p:
        assert p["w"].shape == (2, 2)
    assert sp._device is None  # released on exit
    sp.device()
    assert len(calls) == 2  # re-materialized

    with pytest.raises(ValueError):
        off.StageParams()  # neither source
    with pytest.raises(ValueError):
        off.StageParams(host_tree={}, materialize=make)  # both


def test_resolve_release_passthrough(rng):
    plain = _tree(rng)
    assert off.resolve(plain) is plain
    off.release(plain)  # no-op, no error
    sp = off.StageParams(plain, offload=True)
    d = off.resolve(sp)
    assert isinstance(d["dense"]["kernel"], jax.Array)
    off.release(sp)
    assert sp._device is None


def test_host_or_device_avoids_materialization(rng):
    """Sharded placement reads the host tree directly -- resolving first
    would transiently hold the full unsharded tree on the default device."""
    plain = _tree(rng)
    assert off.host_or_device(plain) is plain
    sp = off.StageParams(plain, offload=True)
    assert off.host_or_device(sp) is plain
    assert sp._device is None  # no device materialization happened
    made = {"n": 0}

    def make():
        made["n"] += 1
        return plain

    sp2 = off.StageParams(materialize=make, offload=True)
    assert off.host_or_device(sp2) is plain  # no host copy -> resolves
    assert made["n"] == 1


def test_host_cast_preserves_int8_scales(rng):
    tree = {
        "blk": {
            "ff": {"kernel_q": rng.integers(-127, 128, (4, 3)).astype(np.int8),
                   "scale": rng.uniform(1e-4, 1e-2, (3,)).astype(np.float32),
                   "bias": np.zeros((3,), np.float32)},
            "ln": {"scale": np.ones((4,), np.float32)},
        }
    }
    out = off.host_cast(tree, jnp.bfloat16)
    assert out["blk"]["ff"]["kernel_q"].dtype == np.int8
    assert out["blk"]["ff"]["scale"].dtype == np.float32  # side-car stays f32
    assert out["blk"]["ff"]["bias"].dtype == jnp.bfloat16
    # a LayerNorm "scale" NOT beside kernel_q is an ordinary param -> bf16
    assert out["blk"]["ln"]["scale"].dtype == jnp.bfloat16
    assert isinstance(out["blk"]["ff"]["kernel_q"], np.ndarray)  # host-resident


def test_should_offload_threshold(monkeypatch):
    monkeypatch.setattr(off, "device_hbm_bytes", lambda: 100)
    assert not off.should_offload(80)
    assert off.should_offload(81)


@pytest.mark.slow
def test_pipeline_offload_parity(rng):
    """A StageParams-wrapped pipeline must produce the plain pipeline's
    output bit-for-bit, and release the DiT/VAE device copies afterwards."""
    from tests.test_pipeline import _inputs, build_tiny_pipeline

    pipe = build_tiny_pipeline()
    video, mask, reference, pe, ne = _inputs(np.random.default_rng(7))
    want = np.asarray(pipe(
        pe, ne, video, mask, reference,
        num_inference_steps=2, guidance_scale=6.0, key=jax.random.PRNGKey(1),
    ))

    sp_dit = off.StageParams(jax.tree.map(np.asarray, pipe.transformer_params),
                             offload=True, name="dit")
    sp_vae = off.StageParams(jax.tree.map(np.asarray, pipe.vae_params),
                             offload=True, name="vae")
    pipe2 = dataclasses.replace(pipe, transformer_params=sp_dit,
                                vae_params=sp_vae)
    got = np.asarray(pipe2(
        pe, ne, video, mask, reference,
        num_inference_steps=2, guidance_scale=6.0, key=jax.random.PRNGKey(1),
    ))
    np.testing.assert_array_equal(got, want)
    assert sp_dit._device is None  # released after denoise
    assert sp_vae._device is None  # released after decode
