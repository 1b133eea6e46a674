from idccrn_vae_tpu.train.optim import (  # noqa: F401
    make_adam,
    PlateauScheduler,
    set_learning_rate,
    get_learning_rate,
)
from idccrn_vae_tpu.train.checkpoint import CheckpointManager  # noqa: F401
