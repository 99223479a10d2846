"""Micro-batch dynamic driver — temporal slices, checkpoint/resume."""
