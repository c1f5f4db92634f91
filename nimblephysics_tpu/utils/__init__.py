"""Host-side utilities: finite differencing, file parsers."""
