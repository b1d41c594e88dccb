"""Device (JAX/XLA/Pallas) compute kernels for sketching and comparison."""
