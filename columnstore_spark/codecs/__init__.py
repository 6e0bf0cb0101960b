"""Pure-Python codec core (numpy/pyarrow only — importable without Spark).

Codec registry (id -> module), mirroring the reference's DI registry
`/root/reference/Outcompute.ColumnStore/Encodings/EncodingLookup.cs:21-46`
and id table `WellKnownEncodings.cs:3-8` (Default=0, Dictionary=1,
Sequential=10); ids 2/11/12/20 are our completions of the reference's
designed-but-unfinished codecs (see chooser.py).
"""

from . import bitpack, chooser, constant, dictrle, forpack, fsst, plain, segment, sequential, stats, values
from .chooser import MODE_NONE, MODE_SIZE, MODE_SPEED, choose
from .segment import (
    CODEC_IDS,
    CODEC_NAMES,
    EncodedSegment,
    decode_segment,
    encode_segment,
    verify_checksum,
)
from .stats import SegmentStats, collect

__all__ = [
    "bitpack", "chooser", "constant", "dictrle", "forpack", "fsst", "plain",
    "segment", "sequential", "stats", "values",
    "MODE_NONE", "MODE_SIZE", "MODE_SPEED", "choose",
    "CODEC_IDS", "CODEC_NAMES", "EncodedSegment",
    "decode_segment", "encode_segment", "verify_checksum",
    "SegmentStats", "collect",
]
