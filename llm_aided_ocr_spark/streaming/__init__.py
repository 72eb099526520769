"""Reserved. The reference has NO streaming surface (SURVEY.md §2.8):
no watermarks, no event-time windows, no stateful operators. Resumability
is handled by batch stage checkpoints (plans.checkpoint), not Structured
Streaming state."""
