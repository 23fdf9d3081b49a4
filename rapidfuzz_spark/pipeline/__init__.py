from . import blocking, cluster, ingest, metrics, scoring, synth  # noqa: F401
from .run import PipelineConfig, run_pipeline  # noqa: F401
