#!/usr/bin/env python
"""Repo-root shim for the SLAM driver (the real CLI lives in
mast3r_slam_tpu/cli.py so the installed package exposes the
``mast3r-slam-tpu`` console script; ``python main.py ...`` keeps working
for in-repo use)."""

from mast3r_slam_tpu.cli import main

if __name__ == "__main__":
    main()
