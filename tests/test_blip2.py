"""True-golden parity of models/blip2.py + utils/convert.convert_blip2
against transformers' own Blip2ForConditionalGeneration at tiny scale
(the reference loads this family at demo.py:36-39 and generates captions at
demo.py:526-536).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from trajectorycrafter_tpu.models.blip2 import (  # noqa: E402
    Blip2Captioner,
    Blip2Config,
    generate_caption_ids,
)
from trajectorycrafter_tpu.utils.convert import RecordingDict, convert_blip2  # noqa: E402

TINY = Blip2Config(
    vision_hidden=32, vision_intermediate=64, vision_layers=2, vision_heads=4,
    image_size=28, patch_size=14,
    num_query_tokens=4, qformer_hidden=24, qformer_layers=2, qformer_heads=4,
    qformer_intermediate=48, cross_attention_frequency=2,
    vocab_size=99, opt_hidden=16, opt_layers=2, opt_heads=4, opt_ffn=32,
    max_positions=64, bos_token_id=2, eos_token_id=7,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (
        Blip2Config as HFBlip2Config,
        Blip2ForConditionalGeneration,
        Blip2QFormerConfig,
        Blip2VisionConfig,
        OPTConfig,
    )

    cfg = HFBlip2Config(
        vision_config=Blip2VisionConfig(
            hidden_size=TINY.vision_hidden,
            intermediate_size=TINY.vision_intermediate,
            num_hidden_layers=TINY.vision_layers,
            num_attention_heads=TINY.vision_heads,
            image_size=TINY.image_size, patch_size=TINY.patch_size,
        ).to_dict(),
        qformer_config=Blip2QFormerConfig(
            hidden_size=TINY.qformer_hidden,
            num_hidden_layers=TINY.qformer_layers,
            num_attention_heads=TINY.qformer_heads,
            intermediate_size=TINY.qformer_intermediate,
            cross_attention_frequency=TINY.cross_attention_frequency,
            encoder_hidden_size=TINY.vision_hidden,
        ).to_dict(),
        text_config=OPTConfig(
            vocab_size=TINY.vocab_size, hidden_size=TINY.opt_hidden,
            num_hidden_layers=TINY.opt_layers,
            num_attention_heads=TINY.opt_heads, ffn_dim=TINY.opt_ffn,
            max_position_embeddings=TINY.max_positions,
            word_embed_proj_dim=TINY.opt_hidden,
            do_layer_norm_before=True, activation_function="relu",
            bos_token_id=TINY.bos_token_id, eos_token_id=TINY.eos_token_id,
        ).to_dict(),
        num_query_tokens=TINY.num_query_tokens,
        image_token_index=98,
    )
    torch.manual_seed(0)
    model = Blip2ForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    sd = RecordingDict({k: v.numpy() for k, v in hf_model.state_dict().items()})
    params = convert_blip2(
        sd, vision_layers=TINY.vision_layers,
        qformer_layers=TINY.qformer_layers, opt_layers=TINY.opt_layers,
        cross_attention_frequency=TINY.cross_attention_frequency,
    )
    # the converter must account for every checkpoint tensor
    assert sd.consumed == set(sd.keys()), (
        sorted(set(sd.keys()) - sd.consumed)[:10])
    return params


def _pixels(rng, b=2):
    return rng.standard_normal((b, 3, TINY.image_size, TINY.image_size)).astype(
        np.float32)


@pytest.mark.slow
def test_vision_model_matches_hf(hf_model, converted, rng):
    px = _pixels(rng)
    with torch.no_grad():
        want = hf_model.vision_model(torch.from_numpy(px)).last_hidden_state.numpy()
    model = Blip2Captioner(TINY)
    got = model.apply(
        {"params": {"vision_model": converted["vision_model"]}},
        jnp.asarray(px.transpose(0, 2, 3, 1)),
        method=lambda m, p: m.vision_model(p))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_prefix_and_lm_logits_match_hf(hf_model, converted, rng):
    """vision -> qformer -> projection -> OPT forward over [queries; bos]."""
    px = _pixels(rng, b=1)
    with torch.no_grad():
        image_embeds = hf_model.vision_model(torch.from_numpy(px)).last_hidden_state
        q = hf_model.query_tokens.expand(1, -1, -1)
        q_out = hf_model.qformer(
            query_embeds=q, encoder_hidden_states=image_embeds
        ).last_hidden_state
        lm_in = hf_model.language_projection(q_out)
        bos = hf_model.get_input_embeddings()(
            torch.tensor([[TINY.bos_token_id]]))
        embeds = torch.cat([lm_in, bos], dim=1)
        want_logits = hf_model.language_model(
            inputs_embeds=embeds,
            attention_mask=torch.ones(embeds.shape[:2], dtype=torch.long),
        ).logits.numpy()

    model = Blip2Captioner(TINY)
    prefix = model.apply({"params": converted}, jnp.asarray(px.transpose(0, 2, 3, 1)),
                         method=Blip2Captioner.prefix_embeds)
    got_logits = model.apply({"params": converted}, prefix, prefix.shape[1],
                             method=Blip2Captioner.decode_step)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits,
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_greedy_generation_ids_match_hf(hf_model, converted, rng):
    px = _pixels(rng, b=1)
    n = 8
    with torch.no_grad():
        hf_ids = hf_model.generate(
            torch.from_numpy(px), do_sample=False, num_beams=1,
            max_new_tokens=n, min_new_tokens=n,
            eos_token_id=None,  # fixed-length greedy for exact comparison
        ).numpy()
    # HF returns [prefix input_ids ; generated]; strip the 33-token prefix
    hf_new = hf_ids[:, -n:]

    model = Blip2Captioner(TINY)
    got = np.asarray(generate_caption_ids(
        model, converted, jnp.asarray(px.transpose(0, 2, 3, 1)),
        max_new_tokens=n, eos_token_id=-1))
    np.testing.assert_array_equal(got, hf_new)


@pytest.mark.slow
def test_native_captioner_end_to_end(hf_model, rng, tmp_path):
    """build_captioner's native path: a checkpoint dir (safetensors + config
    + tokenizer files) drives convert -> flax generate -> BPE decode."""
    import json

    from safetensors.torch import save_file

    from trajectorycrafter_tpu.utils.bpe import bytes_to_unicode
    from trajectorycrafter_tpu.utils.caption import build_captioner

    sd = {k: v.clone() for k, v in hf_model.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    hf_model.config.to_json_file(str(tmp_path / "config.json"))
    (tmp_path / "generation_config.json").write_text(
        json.dumps({"eos_token_id": TINY.eos_token_id, "max_length": 6}))
    vocab = {t: i for i, t in enumerate(bytes_to_unicode().values())}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")

    caption = build_captioner(str(tmp_path), fallback_prompt="FALLBACK")
    out = caption(rng.uniform(0, 1, (30, 40, 3)).astype(np.float32))
    assert isinstance(out, str)
    assert out != "FALLBACK"  # the native path ran, not the fixed prompt

    # HF max_length counts the BOS the decoder starts from: 6 -> 5 new
    # tokens (transformers' generate emits max_length-1); max_new_tokens
    # passes through untouched and wins over max_length
    import trajectorycrafter_tpu.models.blip2 as blip2_mod
    seen = {}
    real = blip2_mod.generate_caption_ids

    def spy(model, p, img, max_new_tokens, eos_token_id):
        seen["max_new"] = max_new_tokens
        return real(model, p, img, max_new_tokens=max_new_tokens,
                    eos_token_id=eos_token_id)

    frame = rng.uniform(0, 1, (30, 40, 3)).astype(np.float32)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(blip2_mod, "generate_caption_ids", spy)
        build_captioner(str(tmp_path))(frame)
        assert seen["max_new"] == 5
        (tmp_path / "generation_config.json").write_text(
            json.dumps({"eos_token_id": TINY.eos_token_id,
                        "max_length": 6, "max_new_tokens": 3}))
        build_captioner(str(tmp_path))(frame)
        assert seen["max_new"] == 3
