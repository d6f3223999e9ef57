from sqe_tpu.train.contrastive import (  # noqa: F401
    TrainState,
    infonce_loss,
    make_sharded_train_step,
    make_train_state,
    train_step,
)
