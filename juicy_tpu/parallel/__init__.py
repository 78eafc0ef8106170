from juicy_tpu.parallel.mesh import make_mesh, shard_clips
from juicy_tpu.parallel.timeshard import sequence_parallel_linear_scan
from juicy_tpu.parallel.corpus import corpus_metrics, run_corpus

__all__ = [
    "make_mesh",
    "shard_clips",
    "sequence_parallel_linear_scan",
    "corpus_metrics",
    "run_corpus",
]
