from gmrm_tpu.parallel.mesh import make_marker_mesh, shard_markers
from gmrm_tpu.parallel.runner import run_training_sharded, make_sharded_step
