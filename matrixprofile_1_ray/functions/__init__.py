"""Vectorized batch-level helper functions (no Ray imports)."""

from .tokenize import tokenize_text_column, detokenize
from .codec import (
    encode_int_dod,
    decode_int_dod,
    encode_float_xor,
    decode_float_xor,
)
