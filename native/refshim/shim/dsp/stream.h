// Stub: the reference's bbframe_ts_parser.h includes <dsp/stream.h> but its
// API uses plain pointers; nothing from the header is required.
#pragma once
