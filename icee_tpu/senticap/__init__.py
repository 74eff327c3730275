from icee_tpu.senticap.config import senticap_conf
from icee_tpu.senticap import (
    adversarial,
    beam,
    encode_decode,
    io,
    model,
    sentiment,
    solver,
    switched,
)
