"""Device kernels: DWT lifting, spectral diff1, and codec modeling."""
