"""Codec registry — import submodules for their registration side effects."""

from .base import (  # noqa: F401
    Codec, EncodeContext, codec_names, decode_array, decode_array_dictionary,
    encode_array, get_codec, pack_chunk, unpack_chunk,
)
from . import plain  # noqa: F401
from . import intcodecs  # noqa: F401
from . import floatcodecs  # noqa: F401
from . import dictionary  # noqa: F401
from . import fsst  # noqa: F401
