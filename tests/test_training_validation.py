"""Training validation + observability tests (training/validation.py).

Covers the reference's held-out validation semantics
(lora_utils_ours/validation.py:28-133), the first-batch sanity dump
(training_loop.py:312-321), the jsonl metrics sink, and the wired
train_lora.py --validate_every path end-to-end at dev scale.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_relative_depth_error_matches_reference_semantics():
    from trajectorycrafter_tpu.training.validation import relative_depth_error

    gt = jnp.array([[2.0, 4.0], [0.0, 8.0]])
    pred = jnp.array([[3.0, 4.0], [1.0, 6.0]])
    mask = jnp.ones_like(gt, bool)
    # gt==0 pixels are excluded (gt > 1e-6 guard); errors 0.5, 0, 0.25
    np.testing.assert_allclose(
        float(relative_depth_error(pred, gt, mask)), (0.5 + 0.0 + 0.25) / 3
    )
    # empty mask -> NaN, as the reference returns
    assert np.isnan(float(relative_depth_error(pred, gt, jnp.zeros_like(mask))))


def test_depth_error_metrics_split():
    from trajectorycrafter_tpu.training.validation import depth_error_metrics

    f, h, w = 2, 4, 6
    gt = np.full((f, h, w, 3), 0.5, np.float32)
    pred = gt.copy()
    pred[:, :, :3] *= 1.2  # error only in the left half
    masks = np.zeros((f, h, w), np.float32)
    masks[:, :, :3] = 255.0  # left half marked inpainted
    m = depth_error_metrics(jnp.asarray(pred), jnp.asarray(gt),
                            jnp.asarray(masks))
    assert m["inpainted_rel_error"] > 0.05
    assert m["non_inpainted_rel_error"] < 1e-6
    assert m["inpainted_pixels"] == f * h * 3
    assert np.isfinite(m["tae"])


def test_tae_ignores_invalid_zero_pixels():
    """unnormalize_depth keeps invalid pixels at exactly 0; a 0 -> d frame
    transition must not blow up the TAE mean (d / 1e-6)."""
    from trajectorycrafter_tpu.training.validation import depth_error_metrics

    f, h, w = 3, 4, 4
    gt = np.full((f, h, w, 3), 0.5, np.float32)
    pred = gt.copy()
    pred[0, 0, 0] = 0.0  # one invalid pixel in frame 0
    m = depth_error_metrics(jnp.asarray(pred), jnp.asarray(gt),
                            np.zeros((f, h, w), np.float32))
    assert np.isfinite(m["tae"]) and m["tae"] < 1e-3, m["tae"]


def test_run_validation_stratifies_and_guards():
    """Per-sample batches of size 1 must span the schedule (not all t=0),
    and an empty val set fails fast instead of averaging to NaN."""
    from trajectorycrafter_tpu.training.validation import run_validation

    seen = []

    def fake_eval(lora, batch, rng):
        seen.append(int(batch["timesteps"][0]))
        return jnp.float32(0.5)

    out = run_validation(
        fake_eval, None,
        [{"gt_latents": np.zeros((1, 2, 2, 2, 2), np.float32)}
         for _ in range(5)])
    assert out == {"val_loss": 0.5, "val_samples": 5}
    assert seen == [0, 250, 500, 749, 999]  # stratified over the SET

    seen.clear()
    run_validation(fake_eval, None,
                   [{"gt_latents": np.zeros((1, 2, 2, 2, 2), np.float32)}])
    assert seen == [499]  # single sample: mid-schedule, not t=0

    with pytest.raises(ValueError, match="empty validation set"):
        run_validation(fake_eval, None, [])


@pytest.mark.slow
def test_eval_loss_is_the_training_objective():
    """make_eval_loss returns the SAME loss program as the train step with
    dropout off: supplying identical timesteps/noise via the batch must give
    bitwise-equal losses (no drifting duplicate implementation)."""
    from trajectorycrafter_tpu.models.dit import CrossTransformer3DModel
    from trajectorycrafter_tpu.schedulers import CogVideoXDDIMScheduler
    from trajectorycrafter_tpu.training.step import make_loss_fn
    from trajectorycrafter_tpu.training.validation import make_eval_loss

    f, h, w, c = 2, 4, 4, 2
    model = CrossTransformer3DModel(
        num_attention_heads=2, attention_head_dim=8, in_channels=2 * c + 1,
        out_channels=c, time_embed_dim=16, text_embed_dim=8, num_layers=2,
        max_text_seq_length=3, cross_attn_dim_head=8, cross_attn_num_heads=2,
        use_rotary_positional_embeddings=True, attention_impl="xla")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, f, h, w, c)),
        jnp.zeros((1, 3, 8)), jnp.zeros((1,)),
        jnp.zeros((1, f, h, w, c + 1)), jnp.zeros((1, 1, h, w, c)))["params"]
    scheduler = CogVideoXDDIMScheduler()
    sch_state = scheduler.set_timesteps(50)
    rng = np.random.default_rng(3)
    batch = {
        "gt_latents": rng.standard_normal((1, f, h, w, c)).astype(np.float32),
        "prompt_embeds": rng.standard_normal((1, 3, 8)).astype(np.float32),
        "ref_latents": rng.standard_normal((1, 1, h, w, c)).astype(np.float32),
        "inpaint_latents": rng.standard_normal((1, f, h, w, c + 1)).astype(np.float32),
        "timesteps": np.array([500], np.int32),
        "noise": rng.standard_normal((1, f, h, w, c)).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(7)
    eval_l = make_eval_loss(model, params, scheduler, sch_state)
    train_l = make_loss_fn(model, params, scheduler, sch_state,
                           cfg_dropout_prob=0.0)
    assert float(eval_l(None, batch, key)) == float(train_l(None, batch, key))


def test_metrics_logger_handles_arrays(tmp_path):
    from trajectorycrafter_tpu.training.validation import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    MetricsLogger(path, tensorboard=False).log(
        1, vec=np.array([1.0, 2.0]), scalar=np.float32(3.0))
    rec = json.loads(open(path).read())
    assert rec["vec"] == [1.0, 2.0] and rec["scalar"] == 3.0


def test_unnormalize_depth_zero_stays_zero():
    from trajectorycrafter_tpu.training.validation import unnormalize_depth

    d = jnp.array([0.0, 0.5, 1.0])
    out = np.asarray(unnormalize_depth(d))
    np.testing.assert_allclose(out, [0.0, 50.5, 100.0])


def test_sanity_check_batch_text():
    from trajectorycrafter_tpu.training.validation import sanity_check_batch

    txt = sanity_check_batch({"gt_latents": np.ones((1, 2, 3), np.float32)}, 0)
    assert "gt_latents" in txt and "(1, 2, 3)" in txt and "mean 1.0" in txt


def test_metrics_logger_appends_jsonl(tmp_path):
    from trajectorycrafter_tpu.training.validation import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(1, loss=0.5)
    log.log(2, loss=0.25, val_loss=0.4)
    recs = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[1]["val_loss"] == 0.4


def test_latents_dataset_split(tmp_path):
    from trajectorycrafter_tpu.training.data import LatentsDataset, save_latent_sample

    for i in range(5):
        save_latent_sample(str(tmp_path / f"s{i}.npz"),
                           gt_latents=np.zeros((2, 4, 6, 4), np.float32))
    ds = LatentsDataset(str(tmp_path))
    train, val = ds.split(0.2, seed=0)
    assert len(train) == 4 and len(val) == 1
    assert set(train.files) | set(val.files) == set(ds.files)
    assert not set(train.files) & set(val.files)
    # deterministic
    t2, v2 = LatentsDataset(str(tmp_path)).split(0.2, seed=0)
    assert t2.files == train.files


def test_iter_batches_rejects_oversized_batch(tmp_path):
    """batch_size > dataset size would yield nothing every epoch and spin
    forever under the epochs=-1 default; it must fail at construction."""
    from trajectorycrafter_tpu.training.data import LatentsDataset, save_latent_sample

    for i in range(2):
        save_latent_sample(str(tmp_path / f"s{i}.npz"),
                           gt_latents=np.zeros((2, 4, 6, 4), np.float32))
    ds = LatentsDataset(str(tmp_path))
    with pytest.raises(ValueError, match="exceeds dataset size"):
        ds.iter_batches(batch_size=3)
    assert len(list(ds.iter_batches(2, epochs=1))) == 1


def _write_samples(root, n=4, seed=0):
    from trajectorycrafter_tpu.training.data import save_latent_sample

    rng = np.random.default_rng(seed)
    f, h, w, c = 3, 4, 6, 4
    for i in range(n):
        save_latent_sample(
            str(root / f"s{i}.npz"),
            gt_latents=rng.standard_normal((f, h, w, c)).astype(np.float32),
            ref_latents=rng.standard_normal((2, h, w, c)).astype(np.float32),
            inpaint_latents=rng.standard_normal((f, h, w, c + 1)).astype(np.float32),
            prompt_embeds=rng.standard_normal((7, 32)).astype(np.float32),
        )


@pytest.mark.slow
def test_train_lora_with_validation_end_to_end(tmp_path, capsys):
    import train_lora

    data_dir = tmp_path / "latents"
    data_dir.mkdir()
    _write_samples(data_dir, n=4)
    out_dir = tmp_path / "out"
    train_lora.main([
        "--data_dir", str(data_dir), "--output_dir", str(out_dir),
        "--train_steps", "4", "--log_every", "2", "--validate_every", "2",
        "--val_fraction", "0.25", "--checkpointing_steps", "4",
    ])
    captured = capsys.readouterr().out
    assert "Sanity check at step 0" in captured
    assert "val_loss" in captured

    recs = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    assert any("val_loss" in r for r in recs)
    assert any("loss" in r for r in recs)
    val_recs = [r for r in recs if "val_loss" in r]
    assert all(np.isfinite(r["val_loss"]) for r in val_recs)
    assert os.path.isdir(out_dir / "lora_final")
