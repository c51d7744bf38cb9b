from trajectorycrafter_tpu.training.lora import (
    apply_lora,
    init_lora_params,
    lora_target_paths,
)
from trajectorycrafter_tpu.training.step import TrainState, make_train_step
