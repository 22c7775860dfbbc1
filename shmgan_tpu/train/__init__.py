from shmgan_tpu.train.state import TrainState, create_train_state  # noqa: F401
from shmgan_tpu.train.step import train_step, make_train_step  # noqa: F401
