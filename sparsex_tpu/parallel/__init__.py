"""Partitioning and multi-device (mesh) execution."""
