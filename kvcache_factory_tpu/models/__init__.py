from . import llama
from .weights import init_params, load_params, params_from_state_dict

__all__ = ["llama", "init_params", "load_params", "params_from_state_dict"]
