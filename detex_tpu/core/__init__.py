"""Core host-side primitives: UTC time, Trace/Stream containers, filters."""
from detex_tpu.core.utc import UTCDateTime
from detex_tpu.core.stream import Stats, Stream, Trace
from detex_tpu.core import filters

__all__ = ["UTCDateTime", "Stats", "Stream", "Trace", "filters"]
