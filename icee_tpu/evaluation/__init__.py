from icee_tpu.evaluation.bleu import (
    brevity_penalty,
    closest_ref_length,
    corpus_bleu,
    modified_precision,
    sentence_bleu,
)
from icee_tpu.evaluation.metrics import (
    AverageMeter,
    masked_cross_entropy,
    masked_top_k_accuracy,
    perplexity,
)
