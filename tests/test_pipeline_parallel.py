"""Pipeline-parallel DiT blocks: GPipe runner == sequential loop.

The runner (parallel/pipeline.py) must reproduce the exact block semantics
of CrossTransformer3DModel step 4 (block 2i -> perceiver i -> block 2i+1)
while streaming microbatches across a ``pp`` mesh axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from trajectorycrafter_tpu.models.dit import (
    CogVideoXBlock,
    CrossTransformer3DModel,
    PerceiverCrossAttention,
)
from trajectorycrafter_tpu.parallel.pipeline import (
    pipeline_dit_blocks,
    stack_superblock_params,
)


def _tiny_model(quant="none", remat=False):
    return CrossTransformer3DModel(
        num_attention_heads=2,
        attention_head_dim=8,
        num_layers=4,
        time_embed_dim=32,
        cross_attn_dim_head=8,
        cross_attn_num_heads=2,
        use_rotary_positional_embeddings=True,
        attention_impl="xla",
        quant=quant,
        remat=remat,
    )


def _block_params(model, rng):
    """Init block + perceiver params directly at the token level."""
    dim = model.inner_dim
    block = CogVideoXBlock(dim, model.num_attention_heads,
                           model.attention_head_dim, attention_impl="xla",
                           quant=model.quant)
    perceiver = PerceiverCrossAttention(dim, model.cross_attn_dim_head,
                                        model.cross_attn_num_heads,
                                        attention_impl="xla",
                                        quant=model.quant)
    h = jnp.zeros((1, 6, dim))
    e = jnp.zeros((1, 3, dim))
    t = jnp.zeros((1, model.time_embed_dim))
    c = jnp.zeros((1, 4, dim))
    params = {}
    for i in range(model.num_layers):
        key = jax.random.PRNGKey(100 + i)
        params[f"blocks_{i}"] = block.init(key, h, e, t, None)["params"]
    for i in range(model.num_layers // 2):
        key = jax.random.PRNGKey(200 + i)
        params[f"perceiver_cross_attention_{i}"] = perceiver.init(
            key, c, h)["params"]
    return params, block, perceiver


@pytest.mark.parametrize("n_microbatches", [1, 2])
@pytest.mark.parametrize("quant,remat", [("none", False), ("int8", False),
                                         ("none", True)])
@pytest.mark.slow
def test_pipeline_matches_sequential(rng, n_microbatches, quant, remat):
    """The pp runner must mirror the sequential loop's block construction:
    quant (int8 stage params would otherwise fail param lookup) and remat
    both propagate."""
    model = _tiny_model(quant=quant, remat=remat)
    params, block, perceiver = _block_params(model, rng)
    dim = model.inner_dim
    b = 2
    hidden = jnp.asarray(rng.standard_normal((b, 6, dim)), jnp.float32)
    encoder = jnp.asarray(rng.standard_normal((b, 3, dim)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((b, model.time_embed_dim)),
                       jnp.float32)
    cross = jnp.asarray(rng.standard_normal((b, 4, dim)), jnp.float32)

    # sequential reference: the model's own block interleave
    h, e = hidden, encoder
    for i in range(model.num_layers):
        h, e = block.apply({"params": params[f"blocks_{i}"]}, h, e, temb, None)
        if i % model.cross_attn_interval == 0:
            j = i // model.cross_attn_interval
            h = h + perceiver.apply(
                {"params": params[f"perceiver_cross_attention_{j}"]}, cross, h)
    want_h, want_e = np.asarray(h), np.asarray(e)

    n_stages = 2
    stacked = stack_superblock_params(params, model.num_layers,
                                      model.cross_attn_interval, n_stages)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pp",))
    got_h, got_e = pipeline_dit_blocks(
        model, stacked, hidden, encoder, temb, None, cross, mesh,
        n_microbatches=n_microbatches)
    np.testing.assert_allclose(np.asarray(got_h), want_h, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), want_e, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_stack_superblock_params_shapes():
    model = _tiny_model()
    rng = np.random.default_rng(0)
    params, _, _ = _block_params(model, rng)
    stacked = stack_superblock_params(params, 4, 2, 2)
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[:2] == (2, 1)  # 2 stages x 1 superblock each
