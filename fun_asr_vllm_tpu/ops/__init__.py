"""TPU compute kernels: XLA reference attention paths and Pallas kernels
(flash prefill, paged decode attention)."""
