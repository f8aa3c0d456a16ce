from naturalspeech2_tpu.ops.schedules import (
    simple_linear_schedule,
    cosine_schedule,
    sigmoid_schedule,
    get_schedule,
    gamma_to_alpha_sigma,
    gamma_to_log_snr,
)
