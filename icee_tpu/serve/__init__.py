from icee_tpu.serve.config import ServeConfig, load_config
from icee_tpu.serve.engine import CaptionEngine
