from .transcripts import (
    TRANSCRIPTS_SQL,
    load_transcripts,
    register_testdata,
    synthetic_transcripts,
)
from .warehouse import Warehouse

__all__ = ["TRANSCRIPTS_SQL", "load_transcripts", "register_testdata",
           "synthetic_transcripts", "Warehouse"]
