"""Pallas TPU kernels + dispatch (reference parity: the FPGA device-kernel
library, SURVEY.md §3 R7/R8 — here Mosaic-compiled TPU kernels whose
in-kernel INT4-PoT decode feeds int8 MXU matmuls)."""
from . import dispatch
