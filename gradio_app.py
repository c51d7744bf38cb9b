"""Gradio demo UI (reference /root/reference/gradio_app.py).

Single-page app: video upload, stride/radius/steps/seed controls, pan/orbit/
zoom preset buttons producing a target-pose string, generate button running
the full pipeline and returning the side-by-side viz video.
"""

from __future__ import annotations

import os

from trajectorycrafter_tpu.cli import config_from_args, get_parser
from trajectorycrafter_tpu.config import TrajCrafterConfig
from trajectorycrafter_tpu.orchestrator import TrajCrafter

# preset pose strings "theta;phi;r;x;y" (reference gradio_app.py:44-76)
TRAJ_PRESETS = {
    "Pan Left": "0;-30;0;0;0",
    "Pan Right": "0;30;0;0;0",
    "Pan Up": "-20;0;0;0;0",
    "Pan Down": "20;0;0;0;0",
    "Orbit Left": "0;-45;0;0;0",
    "Orbit Right": "0;45;0;0;0",
    "Zoom In": "0;0;-0.4;0;0",
    "Zoom Out": "0;0;0.4;0;0",
}


def run_pipeline(video_path, pose_str, stride, radius_scale, steps, seed,
                 cfg: TrajCrafterConfig, tc: TrajCrafter):
    theta, phi, r, x, y = [float(v) for v in pose_str.split(";")]
    cfg.video_path = video_path
    cfg.stride = int(stride)
    cfg.seed = int(seed)
    cfg.render.radius_scale = float(radius_scale)
    cfg.render.camera = "target"
    cfg.render.target_pose = (theta, phi, r, x, y)
    cfg.diffusion.num_inference_steps = int(steps)
    tc.infer_gradual()
    return os.path.join(cfg.save_dir, "viz.mp4")


def build_app(cfg: TrajCrafterConfig):
    import gradio as gr

    tc = TrajCrafter(cfg)
    with gr.Blocks(title="TrajectoryCrafter-TPU") as demo:
        gr.Markdown("# TrajectoryCrafter-TPU\nRedirect the camera trajectory "
                    "of a monocular video (TPU-native JAX pipeline).")
        with gr.Row():
            with gr.Column():
                video = gr.Video(label="Input video")
                pose = gr.Textbox(value="0;30;0;0;0",
                                  label="Target pose (theta;phi;r;x;y)")
                with gr.Row():
                    for name, preset in TRAJ_PRESETS.items():
                        gr.Button(name, size="sm").click(
                            lambda p=preset: p, outputs=pose
                        )
                stride = gr.Slider(1, 4, value=1, step=1, label="Stride")
                radius = gr.Slider(0.1, 3.0, value=1.0, label="Center scale")
                steps = gr.Slider(2, 50, value=50, step=1, label="Sampling steps")
                seed = gr.Number(value=43, label="Seed")
                go = gr.Button("Generate", variant="primary")
            with gr.Column():
                out = gr.Video(label="Result (input | generated)")
        go.click(
            lambda v, p, st, r, n, sd: run_pipeline(v, p, st, r, n, sd, cfg, tc),
            inputs=[video, pose, stride, radius, steps, seed],
            outputs=out,
        )
    return demo


def main(argv=None):
    parser = get_parser()
    parser.add_argument("--port", type=int, default=12345)
    args = parser.parse_args(argv)
    args.video_path = args.video_path or "unused"
    cfg = config_from_args(args)
    app = build_app(cfg)
    app.launch(server_name=args.server_name or "0.0.0.0",
               server_port=args.port)


if __name__ == "__main__":
    main()
