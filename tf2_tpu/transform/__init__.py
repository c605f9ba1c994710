"""Transform Kit — the offline half of the engine (reference parity:
TF2's TransForm Kit, SURVEY.md §3 R1-R3)."""
from . import potq
from .fold import fold_batch_norm
from .calibrate import calibrate
from .quantize import QuantSpec, QuantizedArtifact, quantize_graph
from .prune import PruneSpec, prune_params
from .export import save_artifact, load_artifact, save_quantized
from .pipeline import transform_model
