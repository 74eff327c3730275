from icee_tpu.data.tokenize import word_tokenize
from icee_tpu.data.vocab import Vocabulary, build_vocab, load_vocab
from icee_tpu.data.captions import (
    CaptionExample,
    PairedStyleExample,
    encode_caption,
    load_caption_dataset,
    load_paired_style_dataset,
    load_styled_caption_dataset,
    parse_caption_file,
)
from icee_tpu.data.pipeline import (
    BatchLoader,
    CaptionBatch,
    caption_dataset_loader,
    make_batch,
    pad_captions,
)
