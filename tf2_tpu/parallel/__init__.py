from .mesh import MeshConfig, make_mesh, param_shardings, input_shardings
