from .batcher import ContinuousBatcher
from .server import InferenceServer, serve_http
