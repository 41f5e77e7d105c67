"""Structured Streaming layer: streaming twins of the reference's
three queries plus stateful/custom-window extensions."""
