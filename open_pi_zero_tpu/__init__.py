"""open-pi-zero-tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision-language-action framework.

Re-designs the capabilities of the reference PyTorch pi0 stack
(/root/reference, shroglck/open-pi-zero) as an idiomatic JAX framework:
functional param pytrees, static shapes, `lax.scan` over layers and flow
steps, a fused Pallas attention kernel for the block-wise
mixture-of-transformers mask, and `jax.sharding`/pjit device-mesh
parallelism instead of NCCL DDP.
"""

__version__ = "0.1.0"
