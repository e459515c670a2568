from foley_tpu.training.train import TrainState, flow_match_loss, make_train_step

__all__ = ["TrainState", "flow_match_loss", "make_train_step"]
