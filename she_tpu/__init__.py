"""she_tpu: a TPU-native BFV homomorphic-encryption framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
apple/swift-homomorphic-encryption: the BFV RLWE scheme, keyword PIR
(MulPIR + SimplePIR + Symmetric PIR), and Private Nearest Neighbor Search,
re-designed for TPU hardware (uint32 limb tensors, batched modular kernels,
sharded serving over a jax device mesh).
"""

__version__ = "0.1.0"
