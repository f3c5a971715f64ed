from .checkpoint import save_checkpoint, load_checkpoint, load_checkpoint_path
from .ema import EMAState, ema_update, ema_decay_schedule
from .debug import save_plot, save_debug_wav, nn_parameters
from .logging import log_params, logging_step, StepTimer
