from raindrop_tpu.train.metrics import classification_metrics, binary_probs_sigmoid  # noqa: F401
from raindrop_tpu.train.plateau import ReduceLROnPlateau, noam_schedule  # noqa: F401
from raindrop_tpu.train.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from raindrop_tpu.train.trainer import Trainer, TrainResult, run_splits  # noqa: F401
