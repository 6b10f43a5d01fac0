from .state import TrainState, make_optimizer, param_labels
from .step import make_train_step
from .evaluate import compute_item_embeddings, evaluate
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
