"""Training validation + observability tests (training/validation.py).

Covers the reference's held-out validation semantics
(lora_utils_ours/validation.py:28-133), the first-batch sanity dump
(training_loop.py:312-321), the jsonl metrics sink, and the wired
train_lora.py --validate_every path end-to-end at dev scale.
"""

import json
import os

import numpy as np
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
