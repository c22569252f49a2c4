from mr_blip_tpu.runners.train_state import TrainState, make_optimizer, make_train_step

__all__ = ["TrainState", "make_optimizer", "make_train_step"]
