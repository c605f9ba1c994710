"""tf2_tpu — a TPU-native quantized-inference engine.

A brand-new framework with the capabilities of the reference
``TF2-Engine/TF2`` two-stage FPGA inference stack, re-designed TPU-first:

- **Transform Kit** (`tf2_tpu.transform`): prunes and quantizes trained CNN
  checkpoints into 4-bit power-of-two ("shift") weights + INT8 activations
  via JAX-traced calibration.
- **Graph** (`tf2_tpu.graph`): the offline<->online IR contract plus the
  graph compiler that fuses conv+BN+ReLU+requantize into single kernels.
- **Kernels** (`tf2_tpu.kernels`): Pallas TPU kernels — in-kernel INT4-PoT
  dequant feeding INT8 MXU matmuls (the shift-add-MAC analog).
- **Runtime** (`tf2_tpu.runtime`): jit/pjit executor over a device mesh.
- **Parallel** (`tf2_tpu.parallel`): mesh topology + sharding specs (DP/TP
  over ICI, multi-host over DCN).
- **Serve** (`tf2_tpu.serve`): continuous-batching multi-host serving layer.

Reference provenance: /root/reference was empty during the survey; the
blueprint is SURVEY.md (reconstruction) + BASELINE.json (driver mandate).
"""

__version__ = "0.1.0"
