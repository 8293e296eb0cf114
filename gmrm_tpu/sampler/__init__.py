from gmrm_tpu.sampler.state import SamplerState, StaticInputs, init_state
from gmrm_tpu.sampler.gibbs import gibbs_iteration, make_gibbs_step
