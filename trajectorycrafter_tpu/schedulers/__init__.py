from trajectorycrafter_tpu.schedulers.betas import make_betas, rescale_zero_terminal_snr
from trajectorycrafter_tpu.schedulers.ddim import CogVideoXDDIMScheduler, DDIMScheduler
from trajectorycrafter_tpu.schedulers.euler import (
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
)
from trajectorycrafter_tpu.schedulers.dpm import CogVideoXDPMScheduler, DPMSolverMultistepScheduler
from trajectorycrafter_tpu.schedulers.pndm import PNDMScheduler

SCHEDULER_REGISTRY = {
    "Euler": EulerDiscreteScheduler,
    "Euler A": EulerAncestralDiscreteScheduler,
    "DPM++": DPMSolverMultistepScheduler,
    "PNDM": PNDMScheduler,
    "DDIM_Cog": CogVideoXDDIMScheduler,
    "DDIM_Origin": DDIMScheduler,
}
