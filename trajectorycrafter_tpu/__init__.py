"""TrajectoryCrafter-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of TrajectoryCrafter.

Re-implements the full capability surface of alekseizhuravlev/TrajectoryCrafter
(camera-trajectory redirection for monocular video: video depth -> point-cloud
forward-splat re-rendering -> dual-stream video-diffusion inpainting) as an
idiomatic JAX framework:

- ``geometry``  : camera math, trajectory synthesis, forward-splat warper,
                  global point-cloud z-buffer renderer (reference:
                  models/utils.py, notebooks/06_10_25_vggt/warper_point_cloud.py)
- ``ops``       : TPU kernels: scatter splatting, resize with torch semantics,
                  3D RoPE / sincos positional embeddings, flash attention
- ``models``    : CogVideoX 3D causal VAE, CrossTransformer3D DiT, T5 encoder,
                  DepthCrafter (SVD-style) video-depth UNet
- ``schedulers``: DDIM / CogVideoX-DDIM / Euler / EulerA / PNDM / DPM++ samplers
- ``pipelines`` : jit-compiled end-to-end denoise pipeline and windowed depth
- ``parallel``  : mesh / sharding rules (pjit over data+sequence+tensor axes)
- ``training``  : LoRA fine-tuning of the DiT (optax, data-parallel pjit)
"""

__version__ = "0.1.0"
