"""Table sources & sinks: pages synthesis, JSONL IO, snapshot log."""
