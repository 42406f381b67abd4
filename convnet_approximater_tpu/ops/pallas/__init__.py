from .msca_kernels import msca_fused, pack_cascade_weights, parallel_cascade
from .lowrank_kernels import lowrank_conv, lowrank_params_from_module
