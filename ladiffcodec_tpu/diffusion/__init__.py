from .gaussian import (
    GaussianDiffusion1D,
    DiffusionSchedule,
    make_schedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    sigmoid_beta_schedule,
    ModelPrediction,
)
