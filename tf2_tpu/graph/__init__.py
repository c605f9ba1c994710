from .ir import Graph, GraphBuilder, Node, TensorSpec, IR_VERSION, OPS
from .execute import execute, register_op
from .init_params import init_params
from . import qops  # registers quantized-op executors
from . import detection_ops  # registers box_decode/nms executors
