"""Fetch the model zoo from HuggingFace (reference download/download_hf.py:5-30).

Downloads the five checkpoint repos the pipeline loads
(SURVEY.md section 1 zoo table; loaded at reference demo.py:636-666 /
models/infer.py:20-31) into ``checkpoints/`` and, with ``--verify``, checks
each fetched state dict against the converter key contracts so a truncated
or wrong download fails here instead of at model-build time.

Requires network egress; in an air-gapped environment copy the checkpoint
dirs in by hand and run the same --verify pass.
"""

from __future__ import annotations

import argparse
import os

ZOO = {
    # repo_id -> (local subdir, [(subfolder, component)] for --verify)
    "TrajectoryCrafter/TrajectoryCrafter": (
        "TrajectoryCrafter", [("transformer", "dit")]),
    "alibaba-pai/CogVideoX-Fun-V1.1-5b-InP": (
        "CogVideoX-Fun-V1.1-5b-InP", [("vae", "vae"), ("text_encoder", "t5")]),
    "tencent/DepthCrafter": ("DepthCrafter", [("unet", "svd_unet")]),
    "stabilityai/stable-video-diffusion-img2vid": (
        "stable-video-diffusion-img2vid",
        [("vae", "svd_vae"), ("image_encoder", "clip")]),
    "Salesforce/blip2-opt-2.7b": ("blip2-opt-2.7b", []),  # host captioner
}


def verify_dir(path: str, component: str) -> None:
    from trajectorycrafter_tpu.utils.convert import (
        _convert_component,
    )

    _convert_component(component, path)  # raises on key-contract mismatch
    print(f"[download_hf] verified {component}: {path}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Download the TrajectoryCrafter model zoo from HF.")
    parser.add_argument("--root", default="checkpoints",
                        help="destination directory (default: checkpoints/)")
    parser.add_argument("--only", nargs="*", default=None,
                        help="subset of repo ids to fetch")
    parser.add_argument("--verify", action="store_true",
                        help="after download, run each weight dir through the "
                             "converter key contracts")
    args = parser.parse_args(argv)

    from huggingface_hub import snapshot_download

    for repo_id, (subdir, checks) in ZOO.items():
        if args.only and repo_id not in args.only:
            continue
        dst = os.path.join(args.root, subdir)
        print(f"[download_hf] {repo_id} -> {dst}")
        snapshot_download(repo_id=repo_id, local_dir=dst)
        if args.verify:
            for subfolder, component in checks:
                verify_dir(os.path.join(dst, subfolder), component)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
