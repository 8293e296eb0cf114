from gmrm_tpu.ops.decode import (
    decode_planes_jax,
    to_phase_planes,
    from_phase_planes,
    phase_pad_len,
)
from gmrm_tpu.ops.blockops import block_gram, block_eps_update, marker_stats_jax
