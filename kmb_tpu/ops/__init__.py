"""TPU compute ops: kernel functions, Pallas tiled engines, solvers."""
