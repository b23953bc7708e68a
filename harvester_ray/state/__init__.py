"""Stateful orchestration: task-DAG stage protocol + partition checkpoints."""
