"""CLI arg -> config mapping (trajectorycrafter_tpu/cli.py).

The flag surface mirrors the reference's argparse
(/root/reference/inference.py:8-172); the TPU additions (--offload,
--mesh_*, --quant) and the --cpu_offload compatibility alias are mapped
here.
"""

import pytest

from trajectorycrafter_tpu.cli import config_from_args, get_parser, validate


def parse(*argv):
    return config_from_args(get_parser().parse_args(list(argv)))


def test_defaults_roundtrip():
    cfg = parse("--video_path", "v.mp4")
    assert cfg.offload == "auto"
    # int8 DiT GEMMs are the default since the round-5 same-seed quality
    # gate passed (bench_int8_ab.json); --quant none opts back into bf16
    assert cfg.diffusion.quant == "int8"
    assert (cfg.parallel.dp, cfg.parallel.sp, cfg.parallel.tp) == (1, 1, 1)
    assert cfg.save_dir.endswith(cfg.exp_name)


def test_offload_flag_direct():
    assert parse("--video_path", "v.mp4", "--offload", "stage").offload == "stage"
    assert parse("--video_path", "v.mp4", "--offload", "none").offload == "none"


def test_cpu_offload_alias_maps_to_stage():
    # reference-CLI spelling --cpu_offload model/sequential -> stage offload
    for mode in ("model", "sequential"):
        cfg = parse("--video_path", "v.mp4", "--cpu_offload", mode)
        assert cfg.offload == "stage"
    # not passed -> auto default preserved (alias must not fire on its own)
    assert parse("--video_path", "v.mp4").offload == "auto"
    # an explicit --offload wins over the alias
    cfg = parse("--video_path", "v.mp4", "--cpu_offload", "model",
                "--offload", "none")
    assert cfg.offload == "none"


def test_mesh_and_quant_plumbing():
    cfg = parse("--video_path", "v.mp4", "--mesh_dp", "2", "--mesh_sp", "2",
                "--mesh_tp", "2", "--quant", "none")
    assert (cfg.parallel.dp, cfg.parallel.sp, cfg.parallel.tp) == (2, 2, 2)
    assert cfg.diffusion.quant == "none"  # bf16 opt-out stays available
    assert cfg.depth.quant == "none"  # separate decision, separate flag
    cfg = parse("--video_path", "v.mp4", "--quant_depth", "int8")
    assert cfg.depth.quant == "int8" and cfg.diffusion.quant == "int8"


def test_validate_rejects_bad_video_length(tmp_path):
    video = tmp_path / "v.mp4"
    video.write_bytes(b"x")
    cfg = parse("--video_path", str(video), "--camera", "target",
                "--target_pose", "0", "8", "0.1", "0", "0",
                "--video_length", "48")  # not 8k+1
    with pytest.raises(SystemExit):
        validate(cfg)
    cfg = parse("--video_path", str(video), "--camera", "target",
                "--target_pose", "0", "8", "0.1", "0", "0",
                "--video_length", "49")
    validate(cfg)  # ok
