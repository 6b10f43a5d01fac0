from .preprocess import (
    read_items_text,
    read_items_tokenized,
    read_image_manifest,
    read_behaviors,
    read_behaviors_pairs,
    build_doc_matrix,
    BehaviorData,
)
from .loader import (
    pad_user_sequences,
    TrainBatcher,
    BCETrainBatcher,
    DSSMTrainBatcher,
    EvalBatches,
    sample_negatives,
)
