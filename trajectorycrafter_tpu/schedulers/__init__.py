from trajectorycrafter_tpu.schedulers.betas import make_betas, rescale_zero_terminal_snr
from trajectorycrafter_tpu.schedulers.ddim import CogVideoXDDIMScheduler, DDIMScheduler
from trajectorycrafter_tpu.schedulers.euler import (
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
)
from trajectorycrafter_tpu.schedulers.dpm import CogVideoXDPMScheduler, DPMSolverMultistepScheduler
from trajectorycrafter_tpu.schedulers.pndm import PNDMScheduler

def _euler_deployed():
    """'Euler' menu entry with the CogVideoX-Fun checkpoint's scheduler
    config, as the reference's from_pretrained load applies it (demo.py:
    647-657): trailing spacing, steps_offset 0, zero-terminal-SNR rescale.
    (The class defaults stay generic because DepthCrafter reuses the same
    class with the SVD config.)"""
    return EulerDiscreteScheduler(
        timestep_spacing="trailing", steps_offset=0, rescale_betas_zero_snr=True
    )


def _euler_a_deployed():
    return EulerAncestralDiscreteScheduler(
        timestep_spacing="trailing", steps_offset=0, rescale_betas_zero_snr=True
    )


SCHEDULER_REGISTRY = {
    "Euler": _euler_deployed,
    "Euler A": _euler_a_deployed,
    "DPM++": DPMSolverMultistepScheduler,
    "PNDM": PNDMScheduler,
    "DDIM_Cog": CogVideoXDDIMScheduler,
    "DDIM_Origin": DDIMScheduler,
}
