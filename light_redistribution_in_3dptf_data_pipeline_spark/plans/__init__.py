"""Composable pipeline plans with Parquet stage checkpoints."""
