from .logging import log, set_verbosity, SRV_INF, SRV_WRN, SRV_ERR, SRV_DBG
from .text import (
    base64_decode,
    base64_encode,
    fnv1a_64,
    longest_common_prefix,
    utf8_is_valid,
    utf8_safe_split_point,
)
from .tokenbucket import RatelimitTokenBucket, ParallelControlTokenBucket
