from icee_tpu.core.config import (
    AttentionDecoderConfig,
    DecoderConfig,
    EncoderConfig,
    Seq2SeqConfig,
    TrainConfig,
    MODES,
    MODE_FACTUAL,
    MODE_HAPPY,
    MODE_SAD,
    MODE_ANGRY,
    mode_id,
)
from icee_tpu.core import initializers
