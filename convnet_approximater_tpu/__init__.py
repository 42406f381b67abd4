"""convnet_approximater_tpu: TPU-native post-training ConvNet approximation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ashun989/ConvNet-Approximater`` (see SURVEY.md): config-driven layer
substitution, low-rank/separable approximation solves (batched SVD + jitted
alternating least squares), MSCA re-parameterization, SPMD fine-tuning over a
device mesh, and fused Pallas separable-conv inference kernels.
"""

__version__ = "0.1.0"
