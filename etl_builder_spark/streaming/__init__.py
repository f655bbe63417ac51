"""Structured Streaming surface (SURVEY.md §2 J-rows).

Every streaming operator exists twice: as a deterministic BATCH twin
over the same event-time logic (declared + oracle-checked in
batch_twins.py) and as a real readStream pipeline (runtime.py,
exercised by tests with a memory sink). This keeps the correctness
gate exact while still proving the streaming plans execute.
"""
