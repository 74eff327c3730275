from icee_tpu.decode.beam import BeamResult, beam_search
from icee_tpu.decode.greedy import greedy_decode
