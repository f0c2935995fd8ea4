"""Device-side ops: bit packing, Pallas kernels (SURVEY.md §7 steps 3/8)."""
