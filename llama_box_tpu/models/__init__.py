from .config import ModelConfig
from .loader import load_model
