"""Orbit batch runner: sweep preset target poses with one shared model stack
(reference /root/reference/inference_orbits.py:235-300)."""

from __future__ import annotations

import argparse
import os
import time
import traceback

from trajectorycrafter_tpu.cli import config_from_args, get_parser
from trajectorycrafter_tpu.orchestrator import TrajCrafter

# preset orbit variants (reference inference_orbits.py:248-269)
ORBIT_VARIANTS = {
    "left30": (0.0, -30.0, 0.0, 0.0, 0.0),
    "left45": (0.0, -45.0, 0.0, 0.0, 0.0),
    "left90": (0.0, -90.0, 0.0, 0.0, 0.0),
    "right30": (0.0, 30.0, 0.0, 0.0, 0.0),
    "right45": (0.0, 45.0, 0.0, 0.0, 0.0),
    "right90": (0.0, 90.0, 0.0, 0.0, 0.0),
    "top30": (30.0, 0.0, 0.0, 0.0, 0.0),
    "top45": (45.0, 0.0, 0.0, 0.0, 0.0),
}


def main(argv=None):
    parser = get_parser()
    parser.add_argument("--test_run", action="store_true",
                        help="single-variant smoke run (reference :240-245)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    cfg.render.camera = "target"
    cfg.render.mode = "gradual"

    tc = TrajCrafter(cfg)  # one shared stack across variants
    variants = dict(list(ORBIT_VARIANTS.items())[:1]) if args.test_run else ORBIT_VARIANTS
    base_dir = cfg.save_dir
    for name, pose in variants.items():
        t0 = time.time()
        try:
            cfg.render.target_pose = pose
            cfg.save_dir = os.path.join(base_dir, name)
            os.makedirs(cfg.save_dir, exist_ok=True)
            tc.infer_gradual()
            print(f"[orbit {name}] done in {time.time() - t0:.1f}s")
        except Exception:
            # per-variant isolation keeps the sweep alive (reference :281-298)
            traceback.print_exc()
            print(f"[orbit {name}] FAILED after {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
