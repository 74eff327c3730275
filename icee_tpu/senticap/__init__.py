from icee_tpu.senticap.config import senticap_conf
from icee_tpu.senticap import model, switched, solver, io, beam, sentiment
