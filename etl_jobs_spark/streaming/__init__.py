"""Structured Streaming surface: the 2025-era continuous pipeline
re-expressed as file-source streams with checkpointed exactly-once
sinks, plus the event-time extensions (watermarks, tumbling/sliding/
session windows, custom stateful ops) the reference lacks."""
