from icee_tpu.checkpoint.ckpt import (
    CheckpointState,
    load_checkpoint,
    save_checkpoint,
)
from icee_tpu.checkpoint.torch_import import (
    import_factored_decoder_state_dict,
    import_nic_decoder_state_dict,
    import_encoder_head_state_dict,
)
