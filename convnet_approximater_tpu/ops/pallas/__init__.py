from .msca_kernels import msca_fused, pack_cascade_weights, parallel_cascade
