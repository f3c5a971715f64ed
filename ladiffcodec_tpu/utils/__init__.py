from .checkpoint import save_checkpoint, load_checkpoint, load_checkpoint_path
from .logging import log_params, logging_step, StepTimer
