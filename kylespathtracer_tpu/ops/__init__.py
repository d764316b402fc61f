"""Pallas TPU kernels for the hot paths.

The XLA pipeline (render/) is the always-correct, differentiable
reference; these kernels are the speed-of-light forward path with
explicit layout control: vectors live as separate (rows, lanes) component
planes (never a trailing size-3 axis), every intermediate stays in VMEM,
and the whole shade runs as one fused kernel per row block.
"""
