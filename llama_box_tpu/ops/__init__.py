from .norm import rms_norm, layer_norm
from .rope import RopeParams, compute_rope_cache, apply_rope
from .attention import attention_ref
