from icee_tpu.models import factored_lstm, lstm, attention, seq2seq, encoder, resnet
