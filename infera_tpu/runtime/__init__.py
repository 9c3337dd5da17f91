"""Native host runtime: C++ data plane (blob decode, feature extraction,
hashing, radix partitioning) behind a ctypes C ABI with numpy fallback
(SURVEY.md §7.1 native-code row)."""

from .native import (  # noqa: F401
    blob_decode_f32,
    extract_features_f32,
    hash64_i64,
    native_available,
    radix_partition,
)
