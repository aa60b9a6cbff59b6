from .controller import Controller, serve_controller  # noqa: F401
from .model_worker import ModelWorker, jax_llava_generate_fn, serve_worker  # noqa: F401
from .openai_api import serve_openai_api  # noqa: F401
