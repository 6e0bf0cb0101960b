from .decode import (decode, decode_matching, decode_matching_contains,
                     decode_matching_in,
                     decode_matching_null, decode_matching_range,
                     decode_window, decode_window_global,
                     schema_from_segments)
from .encode import (SEGMENT_SCHEMA, default_rowgroup_expr, encode,
                     encode_files, manifest_of, write_bucketed_layout)
from .topk import topk
from .verify import roundtrip_equal
from .zorder import compute_bounds, zorder_column, zorder_rowgroup_expr

__all__ = [
    "SEGMENT_SCHEMA", "default_rowgroup_expr", "encode", "encode_files",
    "manifest_of", "write_bucketed_layout",
    "decode", "decode_matching", "decode_matching_contains",
    "decode_matching_in",
    "decode_matching_null", "decode_matching_range", "decode_window",
    "decode_window_global",
    "schema_from_segments", "roundtrip_equal",
    "topk",
    "compute_bounds", "zorder_column", "zorder_rowgroup_expr",
]
