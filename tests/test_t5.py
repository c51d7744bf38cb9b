"""T5 encoder parity test against HF transformers (torch CPU, test-only dep)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from trajectorycrafter_tpu.models.t5 import T5Config, T5EncoderModel
from trajectorycrafter_tpu.utils.convert import convert_t5_encoder


@pytest.mark.slow
def test_t5_matches_transformers(rng):
    hf_cfg = transformers.T5Config(
        vocab_size=100,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=3,
        num_heads=4,
        feed_forward_proj="gated-gelu",
        use_cache=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(hf_cfg).eval()

    ids = rng.integers(0, 100, (2, 11))
    mask = np.ones((2, 11), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_t5_encoder(sd, num_layers=3)
    cfg = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3, num_heads=4)
    model = T5EncoderModel(cfg)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask).astype(bool))
    )
    # masked positions differ (HF zeroes nothing either; compare valid tokens)
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :7], want[1, :7], atol=2e-4, rtol=1e-3)


def test_t5_xxl_config_shapes():
    from trajectorycrafter_tpu.models.t5 import t5_xxl_config

    c = t5_xxl_config()
    assert c.d_model == 4096 and c.num_layers == 24 and c.num_heads == 64
    assert c.d_ff == 10240
