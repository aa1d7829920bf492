from .constants import GGMLType, GGUFValueType, GGML_BLOCK_SIZES, GGML_TYPE_SIZES
from .reader import GGUFFile, GGUFTensorInfo
from .writer import GGUFWriter
from . import quants
