from icee_tpu.utils.profiling import StepTimer, trace
from icee_tpu.utils.logging import MetricsLogger
from icee_tpu.utils.embeddings import init_embedding, load_embeddings
