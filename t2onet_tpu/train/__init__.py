"""Training: losses, jitted data-parallel steps, checkpointing."""

from t2onet_tpu.train.loop import (  # noqa: F401
    TrainState,
    create_train_state,
    episode_l1_loss,
    make_episode_step,
    make_supervised_step,
    supervised_losses,
)
