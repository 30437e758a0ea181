"""Ray Data batch operators built on the sketch kernels."""
