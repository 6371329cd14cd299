from tinynn_autograd_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated_sharding,
)
from tinynn_autograd_tpu.parallel.context_parallel import ContextParallel
from tinynn_autograd_tpu.parallel.data_parallel import DataParallel
from tinynn_autograd_tpu.parallel.expert_parallel import ExpertParallel
from tinynn_autograd_tpu.parallel.pipeline_parallel import PipelineParallel
from tinynn_autograd_tpu.parallel.tensor_parallel import TensorParallel

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "ContextParallel", "DataParallel", "ExpertParallel",
    "TensorParallel", "PipelineParallel",
]
