"""Structured Streaming surface: sources, sinks, stateful tasks, monitoring
(≡ the reference's streaming core: input/, output/, state/, window.go,
monitoring.go) — with event-time watermarks and checkpointed state as the
documented semantic upgrades (SURVEY §2.4, §4.2)."""
