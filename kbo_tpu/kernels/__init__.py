"""Device (JAX/XLA/Pallas) kernels for the hot pipeline stages."""
