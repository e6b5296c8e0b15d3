from genmmrec_tpu.models.diffusion.schedule import (
    GaussianSchedule,
    make_schedule,
    q_sample,
    q_posterior_mean,
    snr,
)
from genmmrec_tpu.models.diffusion.sampler import p_sample_loop
from genmmrec_tpu.models.diffusion.dnn import (
    timestep_embedding,
    init_dnn,
    apply_dnn,
)
from genmmrec_tpu.models.diffusion.importance import (
    init_lt_state,
    sample_timesteps,
    update_lt_state,
)
