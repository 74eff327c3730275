from icee_tpu.ops.cells import factored_lstm_cell, lstm_cell, multilayer_lstm_cell
from icee_tpu.ops.pallas_decode import fused_decode_step_topk
