"""CLI drivers: online SLAM, offline two-pass SLAM, synthetic data
generation, calibration.

Replaces the reference's main/run_slam.py and main/run_offline.py with
typed configs and npz/video sources. (Unlike the reference, which is
not runnable as checked out — its modules import through an
``aruco_slam`` package alias that does not exist, SURVEY.md §2 — every
entry point here runs with ``python -m aruco_slam_tpu.apps.<name>``.)
"""
