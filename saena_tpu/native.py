"""Public surface of the native (C++) components.

Golomb-Rice index-stream codec (GR_encoder parity, GR_encoder.{h,cpp}) and
segment delta transforms, compiled from saena_tpu/_native/gr_codec.cpp with
g++ on first use (numpy fallback without a toolchain)."""
from saena_tpu._native import (
    delta_decode,
    delta_encode,
    gr_compress,
    gr_decompress,
    gr_pick_k,
    have_native,
)

__all__ = [
    "delta_decode", "delta_encode", "gr_compress", "gr_decompress",
    "gr_pick_k", "have_native",
]
