"""Benchmark + evaluation support: synthetic marker scenes, ATE/RPE.

The reference repo ships no test data (its input_video.mp4 is
gitignored) and publishes no benchmark numbers (SURVEY.md §6), so both
testing and benchmarking are built on synthetic marker scenes with
exact ground truth.
"""
