"""X16: Structured Streaming over the events stream."""
