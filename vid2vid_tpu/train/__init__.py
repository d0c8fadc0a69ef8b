"""Training subsystem: optimizer groups, jitted steps, curriculum, loop."""

from vid2vid_tpu.train.state import TrainState, create_train_state, Schedule
from vid2vid_tpu.train.steps import make_g_step, make_d_step, make_dt_step
